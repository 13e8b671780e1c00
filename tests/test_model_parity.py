"""Output parity: Flax models with converted weights vs the torch reference.

Builds the reference torch `Model` (random init, eval mode), converts its
state dict with `torch_state_dict_to_variables`, runs both on the same input
and compares semi / desc / decoded objects within tolerance
(SURVEY.md §7 step 2 gate).
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from tests.reference_oracle import import_reference_model_module
from yolopoint_tpu.models import build_model
from yolopoint_tpu.models.convert import (
    fold_batch_norm,
    torch_state_dict_to_variables,
)



def _assert_desc_close(ours, ref, min_cos=0.9995):
    """Unit-descriptor comparison robust to norm amplification: at random
    init the pre-norm desc has magnitude ~1e-4, so L2 normalization amplifies
    fp noise ~1e4x; compare directions (per-pixel cosine), not raw values."""
    cos = (np.asarray(ours) * np.asarray(ref)).sum(-1)
    assert cos.min() > min_cos, f"desc direction mismatch: min cos {cos.min()}"


@pytest.fixture(scope="module")
def ref_models():
    return import_reference_model_module()


def _run_pair(ref_models, model_name, version, nc, H=128, W=160, inp_ch=3):
    torch.manual_seed(0)
    names = [f"c{i}" for i in range(nc)]
    tm = ref_models.Model(names=names, model_name=model_name, version=version, inp_ch=inp_ch)
    tm.eval()

    x = np.random.default_rng(1).uniform(0, 1, (1, inp_ch, H, W)).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(torch.tensor(x))

    variables = torch_state_dict_to_variables(tm.state_dict())
    fm = build_model(model_name, version, nc=nc)
    out = fm.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        train=False,
        decode=True,
    )
    return ref_out, out, variables, fm, x


@pytest.mark.parametrize("version", ["n", "s"])
def test_yolopoint_parity(ref_models, version):
    ref_out, out, *_ = _run_pair(ref_models, "YOLOPoint", version, nc=7)

    semi_ref = ref_out["semi"].numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out["semi"]), semi_ref, atol=1e-3)

    desc_ref = ref_out["desc"].numpy().transpose(0, 2, 3, 1)
    _assert_desc_close(out["desc"], desc_ref)

    # decoded objects: reference eval forward returns (cat(z), raw)
    dec_ref = ref_out["objects"][0].numpy()
    dec = np.asarray(out["objects"][0])
    assert dec.shape == dec_ref.shape
    np.testing.assert_allclose(dec, dec_ref, atol=1e-2)

    # raw per-level tensors
    for ours_lvl, ref_lvl in zip(out["objects"][1], ref_out["objects"][1]):
        np.testing.assert_allclose(np.asarray(ours_lvl), ref_lvl.numpy(), atol=1e-3)


def test_yolopoint_det_parity(ref_models):
    torch.manual_seed(0)
    tm = ref_models.Model(names=(), model_name="YOLOPointDet", version="n", inp_ch=3)
    tm.eval()
    x = np.random.default_rng(2).uniform(0, 1, (1, 3, 64, 96)).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(torch.tensor(x))
    variables = torch_state_dict_to_variables(tm.state_dict())
    fm = build_model("YOLOPointDet", "n")
    out = fm.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(
        np.asarray(out["semi"]), ref_out["semi"].numpy().transpose(0, 2, 3, 1), atol=1e-3
    )
    _assert_desc_close(out["desc"], ref_out["desc"].numpy().transpose(0, 2, 3, 1))


def test_superpoint_parity(ref_models):
    torch.manual_seed(0)
    tm = ref_models.Model(names=(), model_name="SuperPointNet", version=None, inp_ch=1)
    tm.eval()
    x = np.random.default_rng(3).uniform(0, 1, (1, 1, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(torch.tensor(x))
    variables = torch_state_dict_to_variables(tm.state_dict())
    fm = build_model("SuperPointNet", None)
    out = fm.apply(
        {"params": variables["params"]}, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False
    )
    np.testing.assert_allclose(
        np.asarray(out["semi"]), ref_out["semi"].numpy().transpose(0, 2, 3, 1), atol=1e-3
    )
    _assert_desc_close(out["desc"], ref_out["desc"].numpy().transpose(0, 2, 3, 1))


def test_fused_fold_matches_unfused(ref_models):
    ref_out, out, variables, _, x = _run_pair(ref_models, "YOLOPoint", "n", nc=3, H=64, W=64)
    folded = fold_batch_norm(variables)
    fm_fused = build_model("YOLOPoint", "n", nc=3, fused=True)
    out_fused = fm_fused.apply(
        folded, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False, decode=True
    )
    np.testing.assert_allclose(
        np.asarray(out_fused["semi"]), np.asarray(out["semi"]), atol=2e-3
    )
    _assert_desc_close(out_fused["desc"], out["desc"], min_cos=0.999)
