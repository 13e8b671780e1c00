"""Inference pipeline + native library + export + checkpoint tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
# cold-compile >120 s on the 1-core CI host (file_times sweep, r4) -> slow tier
pytestmark = pytest.mark.slow


from yolopoint_tpu.data import native
from yolopoint_tpu.frontend.pipeline import InferencePipeline, preprocess_frame
from yolopoint_tpu.models import build_model


@pytest.fixture(scope="module")
def tiny_model():
    model = build_model("YOLOPoint", "n", nc=3)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    return model, variables


def test_inference_pipeline_end_to_end(tiny_model, rng):
    model, variables = tiny_model
    pipe = InferencePipeline(model, variables, {"detection_threshold": 0.001, "top_k": 64, "max_det": 16})
    img = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    out = pipe(img)
    assert out["keypoints"].shape == (1, 64, 2)
    assert out["descriptors"].shape[0] == 1 and out["descriptors"].shape[1] == 64
    assert out["boxes"].shape == (1, 16, 4)
    # descriptors are unit-normalized where valid
    d = np.asarray(out["descriptors"][0])
    norms = np.linalg.norm(d, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)


def test_process_frame_coordinate_uncrop(tiny_model, rng):
    model, variables = tiny_model
    pipe = InferencePipeline(model, variables, {"detection_threshold": 0.0, "top_k": 32})
    frame = (rng.uniform(0, 1, (70, 77, 3)) * 255).astype(np.uint8)  # non-multiple of 32
    out = pipe.process_frame(frame)
    # crop is (70->64, 77->64) with top=3, left=6: coords in original frame
    kp = out["keypoints"][out["kp_valid"]]
    if len(kp):
        assert kp[:, 0].min() >= 0 and kp[:, 0].max() < 77
        assert kp[:, 1].min() >= 0 and kp[:, 1].max() < 70


def test_preprocess_frame_mod32():
    img = np.zeros((100, 130, 3), np.uint8)
    out, (top, left), ratio = preprocess_frame(img)
    assert out.shape[0] % 32 == 0 and out.shape[1] % 32 == 0
    assert (top, left) == ((100 - 96) // 2, (130 - 128) // 2)


def test_native_library_loaded():
    assert native.available(), "native/libyp_preprocess.so should be built (make -C native)"


def test_native_resize_matches_cv2(rng):
    import cv2

    img = (rng.uniform(0, 255, (48, 64, 3))).astype(np.uint8)
    ours = native.resize_u8(img, 24, 32, mode="area")
    ref = cv2.resize(img, (32, 24), interpolation=cv2.INTER_AREA)
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1  # rounding
    ours_up = native.resize_u8(img, 96, 128, mode="bilinear")
    ref_up = cv2.resize(img, (128, 96), interpolation=cv2.INTER_LINEAR)
    assert np.abs(ours_up.astype(int) - ref_up.astype(int)).max() <= 1


def test_native_letterbox(rng):
    img = (rng.uniform(0, 255, (30, 60, 3))).astype(np.uint8)
    out, (top, left), ratio = native.letterbox_u8(img, 64, 64)
    assert out.shape == (64, 64, 3)
    assert ratio == pytest.approx(64 / 60, abs=1e-5)
    assert out[0, 0, 0] == 114  # padding
    f = native.u8_to_f32(out)
    assert f.dtype == np.float32 and 0 <= f.min() and f.max() <= 1


def test_native_covariance_roundtrip(rng):
    a = rng.normal(size=(6, 6)).astype(np.float32)
    full = (a + a.T) / 2
    packed = native.cov_pack_upper(full)
    assert packed.shape == (21,)
    back = native.cov_unpack_upper(packed, 6)
    np.testing.assert_allclose(back, full, atol=1e-6)


def test_export_pseudo_labels(tiny_model, rng, tmp_path):
    model, variables = tiny_model
    from yolopoint_tpu.export import export_pseudo_labels

    images = {"im0": rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)}
    paths = export_pseudo_labels(
        model, variables, images, tmp_path,
        num_homographies=4, conf_thresh=0.0005, top_k=64,
    )
    assert paths[0].exists()
    pts = np.load(paths[0])["pts"]
    assert pts.ndim == 2 and pts.shape[1] == 3


def test_checkpoint_save_restore(tiny_model, tmp_path, rng):
    import optax

    from yolopoint_tpu.training.checkpoint import CheckpointManager
    from yolopoint_tpu.training.state import create_train_state, make_optimizer

    model, variables = tiny_model
    tx = make_optimizer(learning_rate=1e-3, lrf=0.1, total_epochs=1, steps_per_epoch=1)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 64, 64, 3), tx=tx,
                               variables=variables)
    mgr = CheckpointManager(tmp_path / "run")
    mgr.save(0, state, metadata={"epoch": 0}, fitness=0.5, best=True)

    # perturb then restore
    zeroed = state.replace(
        params=jax.tree_util.tree_map(jnp.zeros_like, state.params)
    )
    restored, meta = mgr.restore(zeroed)
    assert restored is not None and meta["epoch"] == 0
    orig = jax.tree_util.tree_leaves(state.params)[0]
    rest = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(rest), np.asarray(orig))

    best, bmeta = mgr.restore_best(zeroed)
    assert best is not None and bmeta.get("fitness") == 0.5


def test_demo_cli_smoke(tmp_path, rng):
    """The demo CLI streams a directory of frames through the fused bf16
    pipeline and writes annotated outputs (reference demo.py workflow)."""
    import cv2

    from yolopoint_tpu.frontend import demo

    frames = tmp_path / "frames"
    frames.mkdir()
    for i in range(2):
        cv2.imwrite(str(frames / f"f{i}.png"),
                    rng.integers(0, 255, (96, 128, 3), np.uint8))
    out_dir = tmp_path / "out"
    demo.main(["--input", str(frames), "--version", "n", "--img-size", "128",
               "--kpt-conf", "0.0001", "--save-dir", str(out_dir), "--track"])
    outs = sorted(out_dir.glob("*.jpg"))
    assert len(outs) == 2
    assert all(f.stat().st_size > 500 for f in outs)
