"""ON-HARDWARE Pallas parity gates (VERDICT r1 #3).

The interpret-mode tests elsewhere validate kernel *logic* on CPU; these run
the COMPILED Mosaic kernels on a real TPU against their exact XLA twins on
identical inputs — a lowering bug that returns wrong survivors would
otherwise ship silently behind good-looking throughput numbers.

Run (opt-in, never part of the CPU suite):

    YP_TPU_TESTS=1 python -m pytest tests/test_tpu_parity.py -m tpu -v

The conftest keeps the real backend when YP_TPU_TESTS=1; without it every
test here skips.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.default_backend() == "cpu",
        reason="needs a real TPU (YP_TPU_TESTS=1)",
    ),
]


# ---------------------------------------------------------------- keypoint NMS


def _xla_suppressed_map(hm, conf, r, iters, border):
    """Exact XLA twin of the kernel's suppression chain (threshold ->
    simple_nms -> border): the full (B, H, W) suppressed map."""
    from yolopoint_tpu.ops.keypoints import simple_nms

    B, H, W = hm.shape
    x = jnp.where(hm >= conf, hm, 0.0)
    nmsed = simple_nms(x, r, iters)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    ok = (xs >= border) & (xs < W - border) & (ys >= border) & (ys < H - border)
    return np.asarray(jnp.where(ok[None], nmsed, 0.0))


def _xla_tile_reduce(hm, conf, r, iters, border, t):
    """(tile_max, tile_argmax) from the XLA suppressed map. NOTE on ties:
    simple_nms KEEPS exact ties (a constant plateau survives whole), so a
    tile can hold several equal survivors; argmax picks the first, the
    kernel's packed key picks the last — both are valid survivors. Tests
    must therefore treat the argmax as tie-ambiguous and validate chosen
    positions by value against the suppressed map instead."""
    masked = _xla_suppressed_map(hm, conf, r, iters, border)
    B, H, W = masked.shape
    tiles = masked.reshape(B, H // t, t, W // t, t).transpose(0, 1, 3, 2, 4)
    tiles = tiles.reshape(B, -1, t * t)
    return tiles.max(-1), tiles.argmax(-1)


def _assert_positions_attain_tile_max(masked, tile_arg, tile_max, t, nz):
    """Each chosen in-tile position must be an actual survivor attaining the
    tile max in the XLA suppressed map (tie-agnostic position check)."""
    B, H, W = masked.shape
    ntw = W // t
    for b, ti in np.argwhere(nz):
        sub = int(tile_arg[b, ti])
        yy = (ti // ntw) * t + sub // t
        xx = (ti % ntw) * t + sub % t
        assert masked[b, yy, xx] == tile_max[b, ti], (
            f"b={b} tile={ti}: pos {sub} has {masked[b, yy, xx]}, "
            f"tile max {tile_max[b, ti]}"
        )


def _heatmap_with_plateaus(rng, B, H, W):
    """Random peaks PLUS tied-score plateaus — iterative suppression on exact
    ties is where lowering differences would show."""
    hm = rng.uniform(0, 0.01, (B, H, W)).astype(np.float32)
    for b in range(B):
        n = 200
        hm[b, rng.integers(0, H, n), rng.integers(0, W, n)] = rng.uniform(0.1, 1.0, n)
        # 3x3 constant plateaus (every pixel ties with its neighbours)
        for _ in range(10):
            y, x = rng.integers(4, H - 8), rng.integers(4, W - 8)
            hm[b, y : y + 3, x : x + 3] = 0.5
        # pairs of exactly-equal isolated peaks within the NMS radius
        for _ in range(10):
            y, x = rng.integers(8, H - 16), rng.integers(8, W - 16)
            v = rng.uniform(0.2, 0.9)
            hm[b, y, x] = v
            hm[b, y + 2, x + 3] = v
    return hm


# Every shape the serving paths actually run at (VERDICT r3 #2: the r3 bench
# break shipped because only 256x384/r4 was gated):
#   256x384/r4  — unit-test shape
#   288x896/r8  — KITTI inference (configs/kitti_inference.yaml, bench_kitti_n)
#   480x640/r4  — HPatches protocol scale (DataClasses.py:917-931)
#   640x640/r4  — COCO / headline bench
DEPLOY_SHAPES = [
    (256, 384, 4, 0.05),
    (288, 896, 8, 0.12),
    (480, 640, 4, 0.015),
    (640, 640, 4, 0.015),
]


@pytest.mark.parametrize("H,W,r,conf", DEPLOY_SHAPES)
def test_nms_tile_reduce_on_hardware(rng, H, W, r, conf):
    from yolopoint_tpu.ops.pallas_nms import nms_tile_reduce, pallas_available

    assert pallas_available(), "Pallas must be available on the TPU backend"
    B = 2
    iters, border, t = 3, 4, r
    hm = _heatmap_with_plateaus(rng, B, H, W)
    masked = _xla_suppressed_map(jnp.asarray(hm), conf, r, iters, border)
    ref_max, _ = _xla_tile_reduce(jnp.asarray(hm), conf, r, iters, border, t)
    tmax, targ = nms_tile_reduce(jnp.asarray(hm), conf, r, iters, border, t)
    tmax, targ = np.asarray(tmax), np.asarray(targ)
    np.testing.assert_array_equal(tmax, ref_max)
    nz = ref_max > 0
    _assert_positions_attain_tile_max(masked, targ, ref_max, t, nz)
    assert nz.sum() > 100


@pytest.mark.parametrize("H,W,r,conf", DEPLOY_SHAPES)
def test_nms_tile_keys_on_hardware(rng, H, W, r, conf):
    """The packed-key serving path: decoded (score, position) from compiled
    keys must match the XLA tile reduction (scores to key quantization).
    Covers every deployment shape — r3's Mosaic lowering break (BR//t not
    sublane-aligned at 288x896/r8) is exactly what this gate now catches."""
    from yolopoint_tpu.ops.pallas_nms import nms_tile_keys

    B = 2
    iters, border, t = 3, 4, r
    hm = _heatmap_with_plateaus(rng, B, H, W)
    masked = _xla_suppressed_map(jnp.asarray(hm), conf, r, iters, border)
    ref_max, _ = _xla_tile_reduce(jnp.asarray(hm), conf, r, iters, border, t)

    keys = np.asarray(nms_tile_keys(jnp.asarray(hm), conf, r, iters, border, t))
    pos_bits = max((t * t - 1).bit_length(), 1)
    pos_mask = (1 << pos_bits) - 1
    got_scores = np.where(
        keys > 0,
        (keys & ~pos_mask).astype(np.int32).view(np.float32),
        0.0,
    )
    got_pos = np.where(keys > 0, keys & pos_mask, 0)
    nz = ref_max > 0
    assert nz.sum() > 100
    np.testing.assert_array_equal(keys > 0, nz)
    # key packing zeroes the low pos_bits mantissa bits -> 2^(pos_bits-23)
    # relative score quantization (2^-19 at t=4, 2^-17 at t=8)
    np.testing.assert_allclose(got_scores[nz], ref_max[nz], rtol=2**(pos_bits - 23))
    _assert_positions_attain_tile_max(masked, got_pos, ref_max, t, nz)


@pytest.mark.parametrize("H,W,r,conf", DEPLOY_SHAPES)
def test_extract_keypoints_fast_path_matches_xla(rng, H, W, r, conf):
    """End-to-end: extract_keypoints takes the Pallas path on TPU for
    lane-aligned shapes; the decoded point SET must match the XLA branch
    (forced via a non-aligned-W copy padded back — here simply compared by
    re-running the XLA math)."""
    from yolopoint_tpu.ops.keypoints import extract_keypoints

    B, t = 2, r
    hm = _heatmap_with_plateaus(rng, B, H, W)
    pts, scores, valid = extract_keypoints(jnp.asarray(hm), conf, r, 600, 4)
    masked = _xla_suppressed_map(jnp.asarray(hm), conf, r, 3, 4)
    ref_max, _ = _xla_tile_reduce(jnp.asarray(hm), conf, r, 3, 4, t)

    ntw = W // t
    for b in range(B):
        v = np.asarray(valid[b])
        got_tiles = {}
        for (x, y), s in zip(np.asarray(pts[b])[v], np.asarray(scores[b])[v]):
            xi, yi = int(x), int(y)
            ti = (yi // t) * ntw + xi // t
            got_tiles[ti] = (xi, yi, float(s))
        exp_tiles = set(np.nonzero(ref_max[b] > 0)[0].tolist())
        assert set(got_tiles) == exp_tiles  # same survivor TILES
        for ti, (xi, yi, s) in got_tiles.items():
            # chosen position is a genuine survivor attaining the tile max
            # (ties within a plateau tile may pick a different corner than
            # argmax — both valid, see _xla_tile_reduce docstring)
            assert masked[b, yi, xi] == ref_max[b, ti]
            # score quantization: low pos_bits mantissa bits carry the
            # in-tile position (one extra bit of slack for the rounding)
            pos_bits = max((t * t - 1).bit_length(), 1)
            np.testing.assert_allclose(s, ref_max[b, ti], rtol=2**(pos_bits - 22))


# ---------------------------------------------------------------- box NMS


def test_pallas_greedy_nms_on_hardware(rng):
    from yolopoint_tpu.ops.nms import _greedy_nms_keep
    from yolopoint_tpu.ops.pallas_box_nms import pallas_greedy_nms

    B, K = 3, 512
    ctr = rng.uniform(0, 640, (B, K, 2))
    wh = rng.uniform(5, 150, (B, K, 2))
    boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], axis=-1).astype(np.float32)
    # duplicate-box ties: identical geometry at different priorities
    boxes[:, 100:120] = boxes[:, 80:100]
    valid = rng.uniform(size=(B, K)) < 0.9
    keep_p = pallas_greedy_nms(jnp.asarray(boxes), jnp.asarray(valid), 0.45)
    keep_x = jax.vmap(_greedy_nms_keep, in_axes=(0, 0, None))(
        jnp.asarray(boxes), jnp.asarray(valid), 0.45
    )
    np.testing.assert_array_equal(np.asarray(keep_p), np.asarray(keep_x))


def test_pallas_greedy_nms_chain_on_hardware():
    """Adversarial overlapping chain — long suppression dependencies across
    kernel block boundaries."""
    from yolopoint_tpu.ops.nms import _greedy_nms_keep
    from yolopoint_tpu.ops.pallas_box_nms import pallas_greedy_nms

    K = 512
    x = np.arange(K, dtype=np.float32) * 4.0
    boxes = np.stack(
        [x, np.zeros(K, np.float32), x + 10.0, np.full(K, 10.0, np.float32)],
        axis=-1,
    )
    valid = np.ones(K, bool)
    keep_p = pallas_greedy_nms(boxes[None], valid[None], 0.3)
    keep_x = _greedy_nms_keep(jnp.asarray(boxes), jnp.asarray(valid), 0.3)
    np.testing.assert_array_equal(np.asarray(keep_p)[0], np.asarray(keep_x))


def test_batched_nms_overflow_regime_on_hardware(rng):
    """The >dense-cap regime (reference val: max_nms=30000 at conf 0.001):
    the tiled-scan suppression must agree with the dense path where both
    apply, and report candidate telemetry."""
    from yolopoint_tpu.ops.nms import batched_box_nms

    bs, n, nc = 2, 5000, 3
    xy = rng.uniform(50, 400, (bs, n, 2))
    wh = rng.uniform(10, 80, (bs, n, 2))
    obj = rng.uniform(0.3, 1.0, (bs, n, 1))
    cls = rng.dirichlet(np.ones(nc), (bs, n))
    pred = np.concatenate([xy, wh, obj, cls], axis=-1).astype(np.float32)

    res = batched_box_nms(jnp.asarray(pred), conf_thres=0.001, iou_thres=0.6,
                          max_det=300, max_nms=30000)
    assert int(np.asarray(res["n_candidates"]).min()) == n  # all gated
    # spot-check against the dense path on a truncated copy: the top-4096
    # candidates produce the same leading survivors
    dense = batched_box_nms(jnp.asarray(pred), conf_thres=0.001, iou_thres=0.6,
                            max_det=300, max_nms=4096)
    v_c, v_d = np.asarray(res["valid"]), np.asarray(dense["valid"])
    for b in range(bs):
        k = min(v_c[b].sum(), v_d[b].sum(), 50)  # leading survivors agree
        np.testing.assert_allclose(
            np.asarray(res["scores"][b])[:k], np.asarray(dense["scores"][b])[:k],
            atol=1e-6,
        )


# ---------------------------------------------------------------- MXU warp


def test_mxu_warp_on_hardware(rng):
    """Compiled Mosaic warp (training-shape batch) vs the exact XLA gather
    warp: bilinear within the documented bf16 envelope, nearest exact."""
    from yolopoint_tpu.ops.geometry import _warp_image_xla
    from yolopoint_tpu.ops.homography import sample_homography_batch
    from yolopoint_tpu.ops.pallas_warp import (
        warp_fits_pallas, warp_image_pallas,
    )

    B, H, W, C = 8, 256, 320, 3
    assert warp_fits_pallas((B, H, W, C))
    img = jnp.asarray(rng.uniform(0, 1, (B, H, W, C)).astype(np.float32))
    Hm = sample_homography_batch(jax.random.PRNGKey(7), B)
    hom = jnp.asarray(np.linalg.inv(np.asarray(Hm)))

    got = np.asarray(warp_image_pallas(img, hom, "bilinear"))
    ref = np.asarray(_warp_image_xla(img, hom, "bilinear"))
    # Max-abs bound: pixels and bilinear weights each quantize to bf16
    # (2^-8 relative), so worst-case per-pixel error is ~1e-2 of the [0,1]
    # range; observed max drifts with compiler version (8.2e-3 on 2026-08
    # runtime), so bound at 1.5e-2 and keep the mean bound tight.
    assert np.abs(got - ref).max() < 1.5e-2
    assert np.abs(got - ref).mean() < 2e-3

    img_u8 = jnp.asarray(rng.integers(0, 256, (B, H, W, C)).astype(np.float32))
    got_n = np.asarray(warp_image_pallas(img_u8, hom, "nearest"))
    ref_n = np.asarray(_warp_image_xla(img_u8, hom, "nearest"))
    np.testing.assert_array_equal(got_n, ref_n)


def test_windowed_warp_on_hardware(rng):
    """Compiled windowed-DMA warp at the S@640 aug shape vs the exact XLA
    gather warp (the dense MXU kernel cannot serve 640x640 — its VMEM and
    FLOP cost scale with the image; this one scales with the source
    window)."""
    from yolopoint_tpu.ops.geometry import _warp_image_xla
    from yolopoint_tpu.ops.homography import sample_homography_np
    from yolopoint_tpu.ops.pallas_warp import (
        warp_fits_pallas, warp_fits_windowed, warp_image_pallas_windowed,
    )

    B, H, W, C = 4, 640, 640, 3
    assert not warp_fits_pallas((B, H, W, C))
    assert warp_fits_windowed((B, H, W, C))
    img = jnp.asarray(rng.uniform(0, 1, (B, H, W, C)).astype(np.float32))
    hom = jnp.asarray(np.stack([
        sample_homography_np((H, W), seed=i, patch_ratio=0.85,
                             perspective=True, scaling=True, rotation=True,
                             translation=True) for i in range(B)]), jnp.float32)
    got = np.asarray(warp_image_pallas_windowed(img, hom, "bilinear"))
    ref = np.asarray(_warp_image_xla(img, hom, "bilinear"))
    assert np.abs(got - ref).max() < 1.5e-2
    assert np.abs(got - ref).mean() < 2e-3

    got_n = np.asarray(warp_image_pallas_windowed(img, hom, "nearest"))
    ref_n = np.asarray(_warp_image_xla(img, hom, "nearest"))
    # nearest: exact selection, bf16 value quantization only
    assert np.abs(got_n - ref_n).max() < 2.5e-3


# ---------------------------------------------------------------- MXU gather


def test_mxu_descriptor_sampling_on_hardware(rng):
    from yolopoint_tpu.ops.pallas_gather import (
        sample_descriptors_pallas, sampling_fits_pallas,
    )
    from yolopoint_tpu.ops.sampling import sample_descriptors

    B, Hc, Wc, D, N = 2, 40, 64, 256, 300
    assert sampling_fits_pallas((B, Hc, Wc, D))
    desc = rng.normal(size=(B, Hc, Wc, D)).astype(np.float32)
    pts = rng.uniform(0, 8 * Wc - 1, (B, N, 2)).astype(np.float32)
    pts[..., 1] *= (Hc - 1) / (Wc - 1)  # keep y in range
    fast = sample_descriptors_pallas(jnp.asarray(desc), jnp.asarray(pts))
    exact = sample_descriptors(jnp.asarray(desc), jnp.asarray(pts))
    a, b = np.asarray(fast), np.asarray(exact)
    assert np.abs(a - b).max() < 5e-3          # bf16 matmul tolerance
    assert (a * b).sum(-1).min() > 0.9999      # unit-norm cosine agreement
