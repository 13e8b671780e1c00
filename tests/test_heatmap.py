"""Heatmap encode/decode parity vs the reference's torch PixelShuffle path."""

import numpy as np
import jax.numpy as jnp
import torch

from yolopoint_tpu.ops import heatmap


def ref_labels2Dto3D(labels, cell_size=8, add_dustbin=True):
    """Oracle: /root/reference/src/utils/utils.py:184-209."""
    labels = torch.tensor(labels)[:, None]  # (B,1,H,W)
    B = labels.shape[0]
    pu = torch.nn.PixelUnshuffle(cell_size)
    out = pu(labels)
    Hc, Wc = labels.shape[2] // cell_size, labels.shape[3] // cell_size
    if add_dustbin:
        dustbin = 1 - out.sum(dim=1)
        dustbin[dustbin < 1.0] = 0
        out = torch.cat((out, dustbin.view(B, 1, Hc, Wc)), dim=1)
        out = out / out.sum(dim=1, keepdim=True)
    return out.numpy()


def ref_flatten_detection(semi, cell_size=8):
    """Oracle: /root/reference/src/utils/utils.py:232-262 (batched branch)."""
    semi = torch.tensor(semi)
    dense = torch.nn.functional.softmax(semi, dim=1)
    nodust = dense[:, :-1]
    return torch.nn.PixelShuffle(cell_size)(nodust)[:, 0].numpy()


def test_labels_to_cells_matches_torch(rng):
    B, H, W = 2, 32, 40
    labels = (rng.uniform(0, 1, (B, H, W)) > 0.95).astype(np.float32)
    ours = np.asarray(heatmap.labels_to_cells(jnp.asarray(labels)))  # (B,Hc,Wc,65)
    ref = ref_labels2Dto3D(labels)  # (B,65,Hc,Wc)
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, atol=1e-6)


def test_cells_to_heatmap_matches_torch(rng):
    B, Hc, Wc = 2, 6, 8
    semi = rng.normal(0, 2, (B, Hc, Wc, 65)).astype(np.float32)
    ours = np.asarray(heatmap.cells_to_heatmap(jnp.asarray(semi)))
    ref = ref_flatten_detection(semi.transpose(0, 3, 1, 2))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_space_depth_roundtrip(rng):
    x = rng.normal(size=(3, 24, 16)).astype(np.float32)
    cells = heatmap.space_to_depth(jnp.asarray(x), 8)
    back = heatmap.depth_to_space(cells, 8)
    np.testing.assert_array_equal(np.asarray(back), x)


def test_cell_valid_mask(rng):
    B, H, W = 1, 16, 16
    mask = np.ones((B, H, W), np.float32)
    mask[0, 3, 5] = 0.0  # one invalid pixel in cell (0, 0)
    out = np.asarray(heatmap.cell_valid_mask(jnp.asarray(mask)))
    assert out.shape == (1, 2, 2)
    assert out[0, 0, 0] == 0.0
    assert out[0, 0, 1] == 1.0 and out[0, 1, 1] == 1.0
