"""TrainAgent: end-to-end training orchestration.

Functional re-design of the reference `TrainAgent`
(`/root/reference/src/train.py:32-568`): the python layer only feeds batches,
logs, validates and checkpoints — the whole optimization step is the jitted
`make_train_step` program. Validation mirrors the reference `_validate`
(`:309-568`): val losses, box NMS + mAP stack, point precision/recall, and
extended per-image evaluation (repeatability + homography correctness on up
to `extended_val_sample_size` images), blended into the model-selection
fitness `0.3*(0.55*rep + 0.45*homo) + 0.7*yolo_fitness` (`:551-560`).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from yolopoint_tpu.evaluation.descriptor_eval import compute_homography_correctness
from yolopoint_tpu.evaluation.detector_eval import batch_precision_recall, compute_repeatability
from yolopoint_tpu.evaluation.yolo_eval import (
    ConfusionMatrix,
    ap_per_class,
    combined_fitness,
    fitness_yolo,
    process_batch,
)
from yolopoint_tpu.losses.objects import ObjectLossConfig
from yolopoint_tpu.models import build_model
from yolopoint_tpu.ops.boxes import xywhn2xyxy
from yolopoint_tpu.parallel.mesh import make_mesh, shard_batch
from yolopoint_tpu.training.checkpoint import CheckpointManager
from yolopoint_tpu.training.ema import EarlyStopping
from yolopoint_tpu.training.state import (
    create_train_state,
    freeze_mask_from_spec,
    make_optimizer,
    shrink_perturb,
)
from yolopoint_tpu.training.step import (
    LossWeights,
    make_train_step,
    make_val_step,
    rescale_yolo_gains,
)
from yolopoint_tpu.utils.config import get as cfg_get
from yolopoint_tpu.utils.logging import LOGGER, MetricsWriter, StepTimer


def should_save_checkpoint(epoch: int, epochs: int, best: bool,
                           save_interval: int) -> bool:
    """Rolling-checkpoint cadence (training_params.save_interval): best and
    final epochs always save; otherwise every `save_interval`-th epoch. The
    reference saves every epoch (`/root/reference/src/train.py:277-296`,
    the default here); on the tunneled v5e one orbax save is a ~35 s full
    device->host state transfer, so long small-epoch runs thin it out."""
    return best or epoch == epochs - 1 or (epoch + 1) % save_interval == 0


class TrainAgent:
    """Drives training from a reference-schema YAML config dict."""

    def __init__(
        self,
        config: Mapping[str, Any],
        output_dir: str | Path,
        train_loader,
        val_loader=None,
        mesh=None,
        seed: int = 0,
    ):
        self.config = dict(config)
        self.output_dir = Path(output_dir)
        self.output_dir.mkdir(parents=True, exist_ok=True)
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.mesh = mesh or make_mesh()
        self.rng = jax.random.PRNGKey(seed)

        self.names = list(config.get("names", []))
        self.nc = max(len(self.names), 1)
        model_cfg = config.get("model", {})
        self.model_name = model_cfg.get("name", "YOLOPoint")
        self.version = model_cfg.get("version", "s")
        # bf16 conv stack (params/BN stay f32; losses reduce in f32) — the
        # TPU-native mixed precision replacing the reference's accelerate
        # fp16 flag (`README.md:24-28`, SURVEY.md §7 design stance)
        dtype_name = str(model_cfg.get("dtype",
                         config.get("training_params", {}).get("dtype", "float32")))
        self.compute_dtype = (
            jnp.bfloat16 if dtype_name.lower() in ("bf16", "bfloat16") else jnp.float32
        )
        self.model = build_model(self.model_name, self.version, nc=self.nc,
                                 dtype=self.compute_dtype)

        tp = config.get("training_params", {})
        epochs = int(tp.get("epochs", 100))
        batch_size = int(tp.get("train_batch_size", 8))
        # nominal batch 64 via grad accumulation (reference train.py:38-43)
        n_dev = len(self.mesh.devices.flatten())
        accum = max(round(64 / (batch_size * max(n_dev, 1))), 1)
        steps_per_epoch = len(train_loader)

        # layer freezing by reference named_parameters() index
        # (reference train.py:124-126, configs/kitti.yaml:168-173)
        self.rng, k_init = jax.random.split(self.rng)
        # shape probe WITHOUT spinning up the loader's thread pool / prefetch
        # (a bare `next(iter(loader))` would decode-and-abandon several
        # batches and hold worker threads until GC)
        if hasattr(train_loader, "sample_batch"):
            sample = train_loader.sample_batch()
        else:
            sample = next(iter(train_loader))
        # host-warp loaders ship a zero-channel image stub; the precomputed
        # base view has the shape the model actually consumes (crop frame)
        ref_img = sample.get("precomputed_image_base", sample["image"])
        H, W, C = ref_img.shape[1:4]
        self._sample_shape = (1, H, W, C or 3)
        # jitted init: eager flax init pays one dispatch round-trip per op —
        # minutes over a tunneled TPU (see training.state.create_train_state)
        variables = jax.jit(
            lambda k, x: self.model.init(k, x, train=False)
        )(k_init, jnp.zeros(self._sample_shape, jnp.float32))
        trainable_mask = None
        if spec := config.get("freeze_layers"):
            from yolopoint_tpu.models.yolopoint import REFERENCE_MODULE_ORDER

            trainable_mask = freeze_mask_from_spec(
                variables["params"], str(spec),
                REFERENCE_MODULE_ORDER.get(self.model_name),
            )
            n_frozen = sum(not f for f in jax.tree_util.tree_leaves(trainable_mask))
            LOGGER.info(f"freezing {n_frozen} parameter tensors ({spec!r})")

        tx = make_optimizer(
            learning_rate=float(tp.get("learning_rate", 1e-3)),
            lrf=float(tp.get("lrf", 0.1)),
            total_epochs=epochs,
            # the schedule counts REAL optimizer steps: MultiSteps applies the
            # inner transform once per `accum` micro-batches
            steps_per_epoch=max(steps_per_epoch // accum, 1),
            grad_clip=float(tp["gradclip"]) if tp.get("gradclip") else None,
            accumulate_steps=accum,
            trainable_mask=trainable_mask,
            weight_decay=float(tp.get("weight_decay", 0.0)),
        )
        self.epochs = epochs
        self.accum = accum

        ema_cfg = tp.get("ema") or {}
        if not isinstance(ema_cfg, Mapping):
            ema_cfg = {"enable": bool(ema_cfg)}
        self.ema_enabled = bool(ema_cfg.get("enable", False))
        patience = tp.get("patience")
        self.stopper = EarlyStopping(int(patience)) if patience else None
        self.val_interval = max(int(tp.get("val_interval", 1)), 1)
        # rolling-checkpoint cadence: the per-epoch orbax save is a full
        # device->host state transfer + blocking serialize (~35 s over the
        # tunneled v5e — comparable to a whole 250-step synthetic epoch), so
        # long runs can thin it out; best/final/interrupt saves always happen
        self.save_interval = max(int(tp.get("save_interval", 1)), 1)
        # jax.profiler trace window (replaces the reference's thop/per-layer
        # timers, SURVEY.md §5): training_params.profile: {start_step, num_steps}
        self._profile = tp.get("profile") or None

        img_size = int(cfg_get(config, "data.preprocessing.img_size", 640))
        sp = cfg_get(config, "model.superpoint", {}) or {}
        yolo = cfg_get(config, "model.yolo", {}) or {}
        obj_cfg = ObjectLossConfig(
            box=float(yolo.get("box", 0.05)),
            obj=float(yolo.get("obj", 1.0)),
            cls=float(yolo.get("cls", 0.5)),
            cls_pw=float(yolo.get("cls_pw", 1.0)),
            obj_pw=float(yolo.get("obj_pw", 1.0)),
            anchor_t=float(yolo.get("anchor_t", 4.0)),
            label_smoothing=float(yolo.get("label_smoothing", 0.0)),
            fl_gamma=float(yolo.get("fl_gamma", 0.0)),
        )
        self.obj_cfg = rescale_yolo_gains(obj_cfg, self.nc, img_size)
        sparse_cfg = sp.get("sparse_loss", {}) or {}
        # the reference nests sampling params directly under `sparse_loss`
        # (`/root/reference/configs/coco.yaml:123-125`); our configs use a
        # `params:` subtree — accept both
        sparse = sparse_cfg.get("params", sparse_cfg)
        # descriptor loss selection: the reference's ACTIVE loss is InfoNCE
        # via the aliased import (`/root/reference/src/train.py:8`), so that
        # is the default; `model.superpoint.desc_loss: sparse` selects the
        # hinge contrastive loss (`loss_functions.py:361-480`)
        desc_loss_type = str(
            sp.get("desc_loss", sparse_cfg.get("name", "infonce"))
        ).lower()
        if desc_loss_type not in ("sparse", "infonce"):
            raise ValueError(f"desc_loss must be 'sparse' or 'infonce', got {desc_loss_type!r}")
        # detector loss: "bce" = reference's BCE-after-softmax (parity,
        # `loss_functions.py:600-619`, fine-tuning from pseudo-labels);
        # "ce" = MagicPoint softmax cross-entropy for from-scratch stages
        det_loss_type = str(sp.get("det_loss", "bce")).lower()
        if det_loss_type not in ("bce", "ce"):
            raise ValueError(f"det_loss must be 'bce' or 'ce', got {det_loss_type!r}")
        self.weights = LossWeights(
            lambda_desc=float(cfg_get(config, "model.lambda_loss", 0.1)),
            lambda_obj=float(cfg_get(config, "model.lambda_loss_obj", 10.0)),
            joint_training=bool(config.get("joint_training", True)),
            desc_loss_type=desc_loss_type,
            det_loss_type=det_loss_type,
            num_samples_per_image=int(sparse.get("num_samples_per_image", 1000)),
            num_masked_non_matches_per_match=int(
                sparse.get("num_masked_non_matches_per_match", 120)
            ),
        )
        self.kpt_conf = float(sp.get("detection_threshold", 0.015))
        self.kpt_nms = int(sp.get("nms", 4))
        self.kpt_topk = int(sp.get("top_k", 1000))
        self.box_conf = float(yolo.get("conf_thresh", 0.001))
        self.box_iou = float(yolo.get("iou_thresh", 0.6))
        self.extended_val_n = int(config.get("extended_val_sample_size", 10))

        self.state = create_train_state(
            self.model, self.rng, self._sample_shape, tx=tx, variables=variables,
            ema=self.ema_enabled,
        )

        aug_config = cfg_get(config, "data.augmentation", {}) or {}
        # steps_per_dispatch > 1: scan K optimizer steps per device dispatch
        # (amortizes launch overhead; pairs with the loader host-warp path)
        self.steps_per_dispatch = max(int(tp.get("steps_per_dispatch", 1)), 1)
        self.train_step = make_train_step(
            self.model, self.mesh, aug_config, self.obj_cfg, self.weights, self.nc,
            donate=self.steps_per_dispatch == 1,
            ema_decay=float(ema_cfg.get("decay", 0.9999)),
            ema_tau=float(ema_cfg.get("tau", 2000.0)),
            remat=bool(tp.get("remat", False)),
            accum=accum,
        )
        # device-resident loader + K>1: gather batches INSIDE the scan —
        # per-dispatch traffic is a (K, B) int32 index array (see
        # make_device_multi_step); otherwise scan over host-stacked batches
        self._device_rows = (
            self.steps_per_dispatch > 1
            and getattr(train_loader, "resident_data", None) is not None
        )
        if self._device_rows:
            from yolopoint_tpu.training.step import make_device_multi_step

            self.multi_step = make_device_multi_step(
                self.train_step, self.steps_per_dispatch
            )
        elif self.steps_per_dispatch > 1:
            from yolopoint_tpu.training.step import make_multi_step

            self.multi_step = make_multi_step(self.train_step, self.steps_per_dispatch)
        self._aug_config = aug_config
        val_aug = cfg_get(config, "data.val_augmentation", None)
        self._val_step = make_val_step(
            self.model, val_aug if val_aug is not None else aug_config,
            self.obj_cfg, self.weights, self.nc,
            kpt_conf=self.kpt_conf, kpt_nms=self.kpt_nms, kpt_topk=self.kpt_topk,
            box_conf=self.box_conf, box_iou=self.box_iou,
        )
        self.val_seed = int(config.get("val_seed", 42))

        self.ckpt = CheckpointManager(self.output_dir)
        self.metrics = MetricsWriter(self.output_dir)
        self.timer = StepTimer()
        self.best_fitness = -1.0
        self.global_step = 0
        self.start_epoch = 0

        # warm start / resume hooks
        if wp := config.get("pretrained"):
            self._load_pretrained(wp)
        if config.get("resume"):
            restored, meta = self.ckpt.restore(self.state)
            if restored is not None:
                self.state = restored
                self.start_epoch = int(meta.get("epoch", 0)) + 1
                self.best_fitness = float(meta.get("best_fitness", -1.0))
                self.global_step = int(meta.get("global_step", self.state.step))
                LOGGER.info(f"resumed from epoch {self.start_epoch}")

    def _load_pretrained(self, path: str) -> None:
        """Load torch or orbax weights with class-aware partial merge —
        shape-mismatched leaves (e.g. Detect convs after an nc change) keep
        their fresh init (reference `Model.load_state_dict`,
        `/root/reference/src/models/YOLOPoint.py:102-135`); shrink-perturb if
        configured (reference train.py:109-115, 598-604)."""
        from yolopoint_tpu.models.convert import (
            load_torch_checkpoint,
            merge_partial_variables,
        )

        p = Path(path)
        if p.suffix in (".tar", ".pth", ".pt"):
            loaded = load_torch_checkpoint(str(p))
            target = {"params": self.state.params, "batch_stats": self.state.batch_stats}
            merged, report = merge_partial_variables(target, loaded["variables"])
            if report["shape_mismatch"]:
                LOGGER.info(
                    f"reinitialized {len(report['shape_mismatch'])} mismatched "
                    f"tensors (class count changed?): "
                    f"{report['shape_mismatch'][:4]}..."
                )
            self.state = self.state.replace(
                params=merged["params"], batch_stats=merged["batch_stats"]
            )
            LOGGER.info(f"loaded torch weights from {p} "
                        f"({len(report['loaded'])} tensors)")
        elif p.is_dir():  # our own orbax run (retrain-on-pseudo-labels stage)
            from yolopoint_tpu.training.checkpoint import load_run_variables

            variables = load_run_variables(p)
            target = {"params": self.state.params, "batch_stats": self.state.batch_stats}
            merged, report = merge_partial_variables(target, variables)
            if report["shape_mismatch"]:
                LOGGER.info(
                    f"reinitialized {len(report['shape_mismatch'])} mismatched "
                    f"tensors: {report['shape_mismatch'][:4]}..."
                )
            self.state = self.state.replace(
                params=merged["params"], batch_stats=merged["batch_stats"]
            )
            LOGGER.info(f"loaded orbax weights from {p} "
                        f"({len(report['loaded'])} tensors)")
        if sp := self.config.get("shrink_perturb"):
            self.rng, k = jax.random.split(self.rng)
            self.state = self.state.replace(
                params=shrink_perturb(
                    self.state.params, k,
                    lam=float(sp.get("lam", 0.5)), sigma=float(sp.get("sigma", 0.01)),
                )
            )
            LOGGER.info("applied shrink-perturb warm start")

    # ---------------- training ----------------

    def train(self) -> None:
        """Run the epoch loop; a KeyboardInterrupt saves a `last` checkpoint
        before returning (reference saves last.pth.tar on interrupt,
        `/root/reference/src/train.py:299-305`) — library users get the same
        safety as the CLI."""
        try:
            self._train_loop()
        except KeyboardInterrupt:
            self.ckpt.save(
                int(self.global_step), self.state,
                metadata={"interrupted": True, "global_step": self.global_step,
                          "best_fitness": self.best_fitness},
                best=False,
            )
            LOGGER.info("interrupted — checkpoint saved")

    def _train_loop(self) -> None:
        prof_start = int(self._profile.get("start_step", 10)) if self._profile else -1
        prof_stop = prof_start + int(self._profile.get("num_steps", 5)) if self._profile else -1
        def run_single(batch):
            if self._device_rows:  # `batch` is a (B,) index row here
                batch = self.train_loader.gather_row(batch)
            batch = shard_batch(batch, self.mesh)
            self.rng, k = jax.random.split(self.rng)
            self.state, aux = self.train_step(self.state, batch, k)
            self.global_step += 1
            return aux

        def run_stacked(pending):
            import numpy as np

            self.rng, k = jax.random.split(self.rng)
            if self._device_rows:
                idx = jnp.asarray(np.stack(pending), jnp.int32)  # (K, B)
                self.state, aux_all = self.multi_step(
                    self.state, self.train_loader.resident_data, idx, k
                )
            else:
                from yolopoint_tpu.training.step import stack_batches

                stacked = shard_batch(
                    stack_batches(pending), self.mesh, leading_stack=True
                )
                self.state, aux_all = self.multi_step(self.state, stacked, k)
            self.global_step += len(pending)
            # all K steps' scalars, averaged (v[-1] would alias loss curves)
            return {k_: v.mean(axis=0) for k_, v in aux_all.items()}

        self._profile_started = False
        self._profile_stopped = False
        self._next_log = 1  # log the first dispatch (post-compile) then every 50
        epoch = self.start_epoch - 1
        stopped_early = False
        for epoch in range(self.start_epoch, self.epochs):
            pending: list = []
            # device-rows mode iterates (B,) index rows, not gathered batches
            epoch_iter = (
                self.train_loader.epoch_rows() if self._device_rows
                else self.train_loader
            )
            for batch in epoch_iter:
                if prof_start >= 0 and self.global_step >= prof_start \
                        and not self._profile_started:
                    self._profile_started = True
                    jax.profiler.start_trace(str(self.output_dir / "profile"))
                if not self._device_rows:
                    batch.pop("names", None)
                if self.steps_per_dispatch > 1:
                    # only same-structure batches stack (mosaic batches carry
                    # extra keys): flush the buffer on a structure change
                    if pending and not self._device_rows \
                            and set(batch) != set(pending[0]):
                        for b in pending:
                            run_single(b)
                        pending = []
                    pending.append(batch)
                    if len(pending) < self.steps_per_dispatch:
                        continue
                    aux = run_stacked(pending)
                    pending = []
                else:
                    aux = run_single(batch)
                # >= window checks: global_step advances by K per dispatch
                if prof_stop > 0 and self.global_step >= prof_stop \
                        and not self._profile_stopped:
                    self._profile_stopped = True
                    jax.block_until_ready(aux["loss"])
                    jax.profiler.stop_trace()
                dt = self.timer.tick()
                if self.global_step >= self._next_log:
                    self._next_log = self.global_step + 50
                    per_step = self.timer.mean / max(self.steps_per_dispatch, 1)
                    scalars = {k_: float(v) for k_, v in aux.items()}
                    if scalars.get("nonfinite_skip", 0.0) > 0:
                        # checked at log cadence only: a per-step host read
                        # would serialize the async dispatch pipeline
                        LOGGER.warning(
                            f"e{epoch} s{self.global_step}: non-finite grads "
                            f"in the last dispatch — update(s) skipped"
                        )
                    scalars["step_time"] = per_step
                    self.metrics.write(self.global_step, scalars, prefix="training/")
                    LOGGER.info(
                        f"e{epoch} s{self.global_step} loss={scalars['loss']:.4f} "
                        f"({per_step*1e3:.0f} ms/step)"
                    )
            for b in pending:  # leftover under-full dispatch buffer
                run_single(b)
            # training_params.val_interval: validate every Nth epoch (and the
            # final one) — long synthetic-stage runs would otherwise spend
            # more wall time in host-side validation than in training
            do_val = self.val_loader is not None and (
                (epoch + 1) % self.val_interval == 0 or epoch == self.epochs - 1
            )
            val_scalars = self.validate(epoch) if do_val else {}
            fitness = val_scalars.get("fitness", -1.0)
            best = fitness > self.best_fitness
            if best:
                self.best_fitness = fitness
            stop = do_val and self.stopper is not None and self.stopper(epoch, fitness)
            # with misaligned save/val cadences an early stop can land on a
            # non-save epoch; always save the stop-epoch state so the newest
            # rolling checkpoint matches where training actually ended
            # (reference saves on interrupt/stop, `src/train.py:299-305`)
            if stop or should_save_checkpoint(epoch, self.epochs, best,
                                              self.save_interval):
                self.ckpt.save(
                    epoch, self.state,
                    metadata={
                        "epoch": epoch, "global_step": self.global_step,
                        "best_fitness": self.best_fitness, "names": self.names,
                        "version": self.version, "model_name": self.model_name,
                        "config": self.config,
                    },
                    fitness=fitness, best=best,
                )
            if stop:
                LOGGER.info(
                    f"early stopping at epoch {epoch}: no fitness improvement "
                    f"in the last {self.stopper.patience} epochs"
                )
                stopped_early = True
                break
        # terminal marker for orchestration (tools/bootstrap.py) — only
        # written when the epoch loop actually finished, not on interrupt
        import json as _json

        (self.output_dir / "done.json").write_text(_json.dumps({
            "last_epoch": int(epoch),
            "global_step": int(self.global_step),
            "best_fitness": float(self.best_fitness),
            "stopped_early": stopped_early,
        }))

    # ---------------- validation ----------------

    def validate(self, epoch: int) -> dict[str, float]:
        """Full validation epoch: val losses, YOLO mAP + confusion matrix,
        point precision/recall, and extended repeatability/homography metrics
        on up to `extended_val_sample_size` images. The extended metrics link
        the decoded BASE view and its warped pair through the pair's stored
        homography (reference `_validate`,
        `/root/reference/src/train.py:309-568`)."""
        iouv = np.linspace(0.5, 0.95, 10)
        stats = []
        precs, recs = [], []
        reps, homos, matching, corner_dists = [], [], [], []
        loss_sums: dict[str, float] = {}
        n_batches = 0
        n_extended = 0
        n_panels = 0
        vp = self.config.get("val_plots")
        panels_dir = (
            (Path(vp) if isinstance(vp, str) else self.output_dir / "plots")
            if vp else None
        )
        self.confusion = ConfusionMatrix(self.nc)
        val_key = jax.random.PRNGKey(self.val_seed)

        for bi, batch in enumerate(self.val_loader):
            batch.pop("names", None)
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            # deterministic per-batch augmentation (the reference seeds val
            # sampling by index, DataClasses.py:305,379)
            # validate with the EMA weights when maintained — model selection
            # must score the same weights the best-checkpoint restore serves
            # (ultralytics validates the EMA model likewise)
            val_params = (
                self.state.ema_params
                if getattr(self.state, "ema_params", None) is not None
                else self.state.params
            )
            out = self._val_step(
                val_params, self.state.batch_stats, jb,
                jax.random.fold_in(val_key, bi),
            )
            out = jax.tree_util.tree_map(np.asarray, out)
            n_batches += 1
            for k, v in out["losses"].items():
                loss_sums[k] = loss_sums.get(k, 0.0) + float(v)

            ev, evw = out["base"], out["warped"]
            B, H, W = ev["heatmap"].shape
            hom, inv_h = out["homography"], out["inv_homography"]

            # YOLO stats (labels in the base-view frame)
            for b in range(B):
                bm = out["box_mask"][b].astype(bool)
                gts = out["boxes"][b][bm]
                labels = np.concatenate(
                    [gts[:, :1], np.asarray(xywhn2xyxy(jnp.asarray(gts[:, 1:]), W, H))], axis=1
                ) if len(gts) else np.zeros((0, 5))
                dv = ev["det"]["valid"][b]
                dets = np.concatenate(
                    [ev["det"]["boxes"][b][dv], ev["det"]["scores"][b][dv, None],
                     ev["det"]["classes"][b][dv, None].astype(np.float32)], axis=1
                ) if dv.any() else np.zeros((0, 6))
                correct = process_batch(dets, labels, iouv)
                stats.append((correct, dets[:, 4], dets[:, 5], labels[:, 0]))
                self.confusion.process_batch(dets, labels)

                if n_extended < self.extended_val_n:
                    kp = np.concatenate(
                        [ev["pts"][b][ev["valid"][b]], ev["scores"][b][ev["valid"][b], None]], 1
                    )
                    wkp = np.concatenate(
                        [evw["pts"][b][evw["valid"][b]], evw["scores"][b][evw["valid"][b], None]], 1
                    )
                    rep, _ = compute_repeatability(kp, wkp, hom[b], inv_h[b], (H, W))
                    reps.append(rep)
                    hc = compute_homography_correctness(
                        kp, wkp,
                        ev["desc"][b][ev["valid"][b]], evw["desc"][b][evw["valid"][b]],
                        inv_h[b], (H, W),
                    )
                    homos.append(hc["correctness"])
                    matching.append(hc["matching_score"])
                    if hc["mean_dist"] is not None:
                        corner_dists.append(hc["mean_dist"])
                    n_extended += 1

                    # annotated image panels (reference TB images,
                    # train.py:409-454)
                    if panels_dir is not None and n_panels < 4:
                        from yolopoint_tpu.evaluation.plots import plot_val_panel

                        plot_val_panel(
                            out["image"][b],
                            {"boxes": ev["det"]["boxes"][b],
                             "scores": ev["det"]["scores"][b],
                             "classes": ev["det"]["classes"][b],
                             "valid": ev["det"]["valid"][b]},
                            self.names,
                            panels_dir / f"e{epoch}_panel{n_panels}.png",
                            keypoints=kp[:, :2],
                        )
                        n_panels += 1

            # soft precision/recall of the base heatmap vs base point labels
            pr = batch_precision_recall(ev["heatmap"], out["labels_2d"])
            precs.append(pr["precision"].mean())
            recs.append(pr["recall"].mean())

        # aggregate mAP
        mp = mr = map50 = map_ = 0.0
        self.last_curves = None
        if stats:
            correct = np.concatenate([s[0] for s in stats])
            conf = np.concatenate([s[1] for s in stats])
            pcls = np.concatenate([s[2] for s in stats])
            tcls = np.concatenate([s[3] for s in stats])
            if len(tcls) and len(conf):
                _, _, p, r, _, ap, classes, curves = ap_per_class(
                    correct, conf, pcls, tcls, return_curves=True
                )
                mp, mr = float(p.mean()), float(r.mean())
                map50, map_ = float(ap[:, 0].mean()), float(ap.mean())
                self.last_curves = curves

        rep = float(np.mean(reps)) if reps else 0.0
        homo = float(np.mean(homos)) if homos else 0.0
        fit = combined_fitness(rep, homo, fitness_yolo(mp, mr, map50, map_))
        scalars = {
            "precision": float(np.mean(precs)) if precs else 0.0,
            "recall": float(np.mean(recs)) if recs else 0.0,
            "repeatability": rep,
            "homography_correctness": homo,
            "matching_score": float(np.mean(matching)) if matching else 0.0,
            # median 4-corner error of the estimated H (diagnostic for the
            # binary correctness gate: shows HOW far off estimates are)
            "homography_corner_dist": float(np.median(corner_dists)) if corner_dists else -1.0,
            "mAP50": map50, "mAP": map_, "box_p": mp, "box_r": mr,
            "fitness": fit,
        }
        for k, v in loss_sums.items():
            scalars[k] = v / max(n_batches, 1)
        self.metrics.write(self.global_step, scalars, prefix="validation/")
        if plots_dir := self.config.get("val_plots"):
            self.write_plots(Path(plots_dir) if isinstance(plots_dir, str) else
                             self.output_dir / "plots", epoch)
        LOGGER.info(f"val e{epoch}: {scalars}")
        return scalars

    def write_plots(self, directory: Path, epoch: int) -> None:
        """Render PR/F1 curves + confusion matrix into `directory`
        (reference `metrics_yolo.py:302-341`, `plots_yolo.py`)."""
        from yolopoint_tpu.evaluation.plots import (
            plot_confusion_matrix,
            plot_pr_curves,
        )

        directory.mkdir(parents=True, exist_ok=True)
        if self.last_curves is not None:
            plot_pr_curves(self.last_curves, self.names, directory, prefix=f"e{epoch}_")
        if self.confusion is not None:
            plot_confusion_matrix(
                self.confusion.matrix, self.names, directory / f"e{epoch}_confusion.png"
            )
