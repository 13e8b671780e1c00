"""Class-aware partial checkpoint load + YOLO-backbone transplant
(reference `Model.load_state_dict`/`load_partial_state_dict`
`/root/reference/src/models/YOLOPoint.py:102-135` and
`load_pretrained_yolo` `/root/reference/src/utils/utils.py:64-75`)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from yolopoint_tpu.models import build_model
from yolopoint_tpu.models.convert import (
    merge_partial_variables,
    torch_state_dict_to_variables,
    transplant_yolo_backbone,
)
from yolopoint_tpu.models.yolopoint import REFERENCE_MODULE_ORDER


def _variables(nc, seed=0, hw=(64, 64)):
    model = build_model("YOLOPoint", "n", nc=nc)
    return model.init(jax.random.PRNGKey(seed), jnp.zeros((1, *hw, 3)), train=False)


def test_merge_partial_reinits_detect_on_nc_change():
    target = jax.tree_util.tree_map(np.asarray, _variables(nc=7, seed=0))
    source = jax.tree_util.tree_map(np.asarray, _variables(nc=2, seed=1))
    merged, report = merge_partial_variables(target, source)

    # backbone convs came from the source
    np.testing.assert_array_equal(
        merged["params"]["Conv1"]["conv"]["kernel"],
        source["params"]["Conv1"]["conv"]["kernel"],
    )
    # Detect head kernels shape-mismatch (nc differs) -> fresh target init
    for i in range(3):
        np.testing.assert_array_equal(
            merged["params"]["Detect"][f"m_{i}"]["kernel"],
            target["params"]["Detect"][f"m_{i}"]["kernel"],
        )
        assert f"params.Detect.m_{i}.kernel" in report["shape_mismatch"]
    assert len(report["loaded"]) > 100
    assert not report["missing_in_source"]


def test_merge_partial_exact_when_shapes_match():
    target = jax.tree_util.tree_map(np.asarray, _variables(nc=3, seed=0))
    source = jax.tree_util.tree_map(np.asarray, _variables(nc=3, seed=1))
    merged, report = merge_partial_variables(target, source)
    assert not report["shape_mismatch"]
    chex_equal = jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: bool(np.array_equal(a, b)), merged, source)
    )
    assert chex_equal


def test_transplant_torch_backbone():
    """Zip-transplant a torch reference state dict into fresh variables:
    every copied tensor must equal its converted source and the copy must
    cover at least the shared backbone."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from reference_oracle import import_reference_model_module

    import torch

    ref = import_reference_model_module()
    torch.manual_seed(0)
    tm = ref.Model(names=["a", "b", "c"], model_name="YOLOPoint", version="n")
    sd = tm.state_dict()

    target = jax.tree_util.tree_map(np.asarray, _variables(nc=3, seed=2))
    new_vars, copied = transplant_yolo_backbone(
        sd, target, module_order=REFERENCE_MODULE_ORDER["YOLOPoint"]
    )
    # same architecture + same nc -> the zip should stream a large prefix
    assert copied > 150, f"only {copied} tensors copied"
    converted = torch_state_dict_to_variables(sd)
    np.testing.assert_allclose(
        new_vars["params"]["Conv1"]["conv"]["kernel"],
        converted["params"]["Conv1"]["conv"]["kernel"],
    )
    np.testing.assert_allclose(
        new_vars["params"]["Conv1"]["bn"]["scale"],
        converted["params"]["Conv1"]["bn"]["scale"],
    )
    np.testing.assert_allclose(
        new_vars["batch_stats"]["Conv1"]["bn"]["var"],
        converted["batch_stats"]["Conv1"]["bn"]["var"],
    )


def test_torch_state_dict_roundtrip():
    """torch sd -> Flax variables -> torch sd is the identity on every key
    the forward converter keeps (interop both directions)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from reference_oracle import import_reference_model_module

    import torch

    from yolopoint_tpu.models.convert import variables_to_torch_state_dict

    ref = import_reference_model_module()
    torch.manual_seed(1)
    tm = ref.Model(names=["a", "b"], model_name="YOLOPoint", version="n")
    sd = {k: v for k, v in tm.state_dict().items()
          if not k.endswith(("num_batches_tracked", "anchors", "anchor_grid", "stride"))}
    variables = torch_state_dict_to_variables(sd)
    back = variables_to_torch_state_dict(variables, prefix="model.")
    assert set(back) == set(sd), (
        f"missing={sorted(set(sd) - set(back))[:4]} "
        f"extra={sorted(set(back) - set(sd))[:4]}"
    )
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k].numpy(), err_msg=k)


@pytest.mark.slow  # compile-heavy (fast-tier budget, VERDICT r4 #6)
def test_checkpoint_ema_roundtrip(tmp_path):
    """EMA shadow params survive save/restore and restore_best."""
    import optax

    from yolopoint_tpu.training.checkpoint import CheckpointManager
    from yolopoint_tpu.training.state import create_train_state, make_optimizer

    model = build_model("YOLOPoint", "n", nc=2)
    tx = make_optimizer(learning_rate=0.1)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 32, 32, 3),
                               tx=tx, ema=True)
    grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
    state = state.apply_gradients(grads, state.batch_stats)
    from yolopoint_tpu.training.ema import ema_update

    state = state.replace(
        ema_params=ema_update(state.ema_params, state.params, state.step)
    )
    mgr = CheckpointManager(tmp_path)
    mgr.save(0, state, metadata={"epoch": 0}, fitness=1.0, best=True)

    zeroed = state.replace(
        params=jax.tree_util.tree_map(jnp.zeros_like, state.params),
        ema_params=jax.tree_util.tree_map(jnp.zeros_like, state.ema_params),
    )
    restored, _ = mgr.restore(zeroed)
    ema_leaf = jax.tree_util.tree_leaves(restored.ema_params)[0]
    orig_leaf = jax.tree_util.tree_leaves(state.ema_params)[0]
    np.testing.assert_allclose(np.asarray(ema_leaf), np.asarray(orig_leaf))

    best, meta = mgr.restore_best(zeroed)
    assert best is not None and meta["fitness"] == 1.0
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(best.ema_params)[0]),
        np.asarray(orig_leaf),
    )
