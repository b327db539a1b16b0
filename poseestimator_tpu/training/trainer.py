"""YOLO11-seg trainer: Adam, data-parallel over a device mesh, orbax
checkpoints, patience early-stopping.

Drop-in for the reference's training entry (detection/train.py:5-20): same
operating point (epochs=300, imgsz=640, batch=16, Adam lr0=1e-3, patience=10,
save/save_json, project/name run dirs, resume). Parallelism is jax.sharding:
the batch axis is sharded over a 1-D ``dp`` mesh and gradients are averaged by
XLA collectives over ICI (SURVEY.md section 5: DP over ICI for YOLO training;
batch=16 shards trivially) — the multi-chip path exercised by
``__graft_entry__.dryrun_multichip``.
"""
from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.yolo.model import YOLO11Seg
from .data import Batch, DataLoader, DatasetSpec, list_samples, load_dataset_yaml
from .loss import segmentation_loss


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray
    ema_params: Any = None  # exponential moving average (eval/checkpoint weights)


@dataclass
class TrainConfig:
    data: str  # dataset.yaml path
    epochs: int = 300
    imgsz: int = 640
    batch: int = 16
    optimizer: str = "Adam"
    lr0: float = 0.001
    lrf: float = 0.01  # final lr fraction (linear decay, ultralytics default)
    weight_decay: float = 0.0
    warmup_epochs: float = 3.0
    patience: int = 10
    name: str = "run"
    project: str = "runs"
    exist_ok: bool = True
    resume: bool = False
    save: bool = True
    save_json: bool = True
    device: Any = None  # accepted for CLI parity; placement is mesh-driven
    scale: str = "n"
    dtype: str = "float32"  # "bfloat16" recommended on TPU (conv/MXU path)
    ema: bool = True  # keep an EMA of the weights for eval/checkpoints
    ema_decay: float = 0.9999
    val_map_every: int = 0  # compute val mAP every N epochs (0 = off)
    val_map_limit: int = 64  # max val images per mAP pass
    max_instances: int = 32
    seed: int = 0
    workers: int = 4
    augment: bool = True
    # 4-image mosaic probability (Ultralytics default recipe trains with
    # mosaic on; reference detection/train.py:5-20 inherits it). 0 disables
    # for A/B runs — tools/eval_tracking's trained-detector path and
    # tools/ab_mosaic.py record the comparison.
    mosaic: float = 0.5
    # disable mosaic for the final N epochs (Ultralytics close_mosaic=10):
    # mosaic regularizes early but its stitched statistics hurt the final
    # convergence epochs — measured at smoke scale in tools/ab_mosaic.py
    close_mosaic: int = 10

    @property
    def run_dir(self) -> str:
        return os.path.join(self.project, self.name)


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    total = max(cfg.epochs * steps_per_epoch, 1)
    warmup = int(cfg.warmup_epochs * steps_per_epoch)
    sched = optax.join_schedules(
        [
            optax.linear_schedule(0.0, cfg.lr0, max(warmup, 1)),
            optax.linear_schedule(cfg.lr0, cfg.lr0 * cfg.lrf, max(total - warmup, 1)),
        ],
        [max(warmup, 1)],
    )
    opt = {
        "adam": optax.adam,
        "adamw": optax.adamw,
        "sgd": lambda lr: optax.sgd(lr, momentum=0.937, nesterov=True),
    }[cfg.optimizer.lower()]
    return opt(sched)


class Trainer:
    def __init__(self, cfg: TrainConfig, nc: Optional[int] = None, mesh: Optional[Mesh] = None):
        self.cfg = cfg
        self.spec: DatasetSpec = load_dataset_yaml(cfg.data)
        self.nc = nc if nc is not None else max(self.spec.nc, 1)
        import jax.numpy as _jnp

        self.model = YOLO11Seg(
            nc=self.nc, scale=cfg.scale, dtype=getattr(_jnp, cfg.dtype)
        )

        if mesh is None:
            # batch must shard evenly: use the most devices that divide it
            devs = jax.devices()
            n = len(devs)
            while cfg.batch % n:
                n -= 1
            mesh = Mesh(np.array(devs[:n]), ("dp",))
        self.mesh = mesh
        self.batch_sharding = NamedSharding(mesh, P("dp"))
        self.repl_sharding = NamedSharding(mesh, P())

        self.train_samples = list_samples(self.spec, "train")
        self.val_samples = list_samples(self.spec, "val") or self.train_samples
        self.loader = DataLoader(
            self.train_samples, cfg.batch, cfg.imgsz, cfg.max_instances,
            shuffle=True, augment=cfg.augment, mosaic=cfg.mosaic,
            seed=cfg.seed, workers=cfg.workers,
        )
        self.val_loader = DataLoader(
            self.val_samples, cfg.batch, cfg.imgsz, cfg.max_instances,
            shuffle=False, augment=False, workers=cfg.workers,
        )
        self.tx = make_optimizer(cfg, len(self.loader))
        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()

    # --- state ------------------------------------------------------------
    def init_state(self, rng: Optional[jax.Array] = None) -> TrainState:
        rng = jax.random.PRNGKey(self.cfg.seed) if rng is None else rng
        variables = self.model.init(
            rng, jnp.zeros((1, self.cfg.imgsz, self.cfg.imgsz, 3)), train=True
        )
        state = TrainState(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=self.tx.init(variables["params"]),
            step=jnp.int32(0),
            # distinct buffers: donate_argnums would otherwise see the same
            # buffer twice (params aliasing ema_params at step 0)
            ema_params=(
                jax.tree.map(jnp.copy, variables["params"]) if self.cfg.ema else None
            ),
        )
        return jax.device_put(state, self.repl_sharding)

    # --- compiled steps ---------------------------------------------------
    def _build_train_step(self):
        model, tx = self.model, self.tx
        ema_decay = self.cfg.ema_decay

        @partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, images, boxes, classes, masks, inst_valid):
            def loss_fn(params):
                out, mut = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    images, train=True, mutable=["batch_stats"],
                )
                total, parts = segmentation_loss(
                    out, boxes, classes, masks, inst_valid
                )
                return total, (mut["batch_stats"], parts)

            (loss, (new_stats, parts)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_ema = state.ema_params
            if new_ema is not None:
                # upstream ModelEMA ramp: d = decay * (1 - exp(-step / 2000))
                step_f = (state.step + 1).astype(jnp.float32)
                d = ema_decay * (1.0 - jnp.exp(-step_f / 2000.0))
                new_ema = jax.tree.map(
                    lambda e, p: e * d + p * (1.0 - d), state.ema_params, new_params
                )
            new_state = TrainState(
                params=new_params, batch_stats=new_stats,
                opt_state=new_opt, step=state.step + 1, ema_params=new_ema,
            )
            return new_state, parts

        return train_step

    def _build_eval_step(self):
        model = self.model

        @jax.jit
        def eval_step(state: TrainState, images, boxes, classes, masks, inst_valid):
            p = state.params if state.ema_params is None else state.ema_params
            out = model.apply(
                {"params": p, "batch_stats": state.batch_stats},
                images, train=False,
            )
            total, parts = segmentation_loss(out, boxes, classes, masks, inst_valid)
            return parts

        return eval_step

    def _shard(self, batch: Batch):
        put = lambda a: jax.device_put(jnp.asarray(a), self.batch_sharding)
        return (
            put(batch.images), put(batch.boxes), put(batch.classes.astype(np.int32)),
            put(batch.masks), put(batch.inst_valid),
        )

    # --- loops ------------------------------------------------------------
    def train_epoch(self, state: TrainState):
        metrics = []
        for batch in self.loader:
            state, parts = self._train_step(state, *self._shard(batch))
            metrics.append(parts)
        avg = {k: float(np.mean([float(m[k]) for m in metrics])) for k in metrics[0]}
        return state, avg

    def evaluate(self, state: TrainState):
        metrics = []
        for batch in self.val_loader:
            metrics.append(self._eval_step(state, *self._shard(batch)))
        return {k: float(np.mean([float(m[k]) for m in metrics])) for k in metrics[0]}

    def fit(self, state: Optional[TrainState] = None, log=print, tensorboard: bool = True):
        cfg = self.cfg
        os.makedirs(cfg.run_dir, exist_ok=True)
        tb = None
        if tensorboard:
            try:  # TensorBoard scalars (SURVEY.md section 5 observability).
                # torch's SummaryWriter is an OPTIONAL logging backend — the
                # only torch use outside parity tests; without torch the
                # trainer degrades to results.json/CSV logging only.
                from torch.utils.tensorboard import SummaryWriter

                tb = SummaryWriter(os.path.join(cfg.run_dir, "tb"))
            except Exception:
                tb = None
        start_epoch = 0
        if state is None:
            if cfg.resume and os.path.isdir(os.path.join(cfg.run_dir, "last")):
                state, start_epoch = self.load(os.path.join(cfg.run_dir, "last"))
                log(f"resumed from epoch {start_epoch}")
            else:
                state = self.init_state()

        best_val = float("inf")
        bad_epochs = 0
        history = []
        for epoch in range(start_epoch, cfg.epochs):
            t0 = time.time()
            if (cfg.close_mosaic and self.loader.mosaic
                    and epoch >= cfg.epochs - cfg.close_mosaic):
                # Ultralytics close_mosaic: plain-image final epochs
                self.loader.mosaic = 0.0
                log(f"epoch {epoch}: mosaic off (close_mosaic "
                    f"{cfg.close_mosaic})")
            state, train_m = self.train_epoch(state)
            val_m = self.evaluate(state)
            dt = time.time() - t0
            rec = {
                "epoch": epoch, "time_s": dt,
                **{f"train/{k}": v for k, v in train_m.items()},
                **{f"val/{k}": v for k, v in val_m.items()},
            }
            if cfg.val_map_every and (epoch + 1) % cfg.val_map_every == 0:
                m = self.evaluate_map(state)
                rec["val/map50"] = m["map50"]
                rec["val/map50_95"] = m["map50_95"]
                log(f"  val mAP50 {m['map50']:.4f} mAP50-95 {m['map50_95']:.4f}")
            history.append(rec)
            if tb is not None:
                for k, v in rec.items():
                    if isinstance(v, (int, float)) and k != "epoch":
                        tb.add_scalar(k, v, epoch)
            log(
                f"epoch {epoch}: train {train_m['total']:.4f} "
                f"val {val_m['total']:.4f} ({dt:.1f}s)"
            )
            if cfg.save:
                self.save(state, os.path.join(cfg.run_dir, "last"), epoch + 1)
            if val_m["total"] < best_val - 1e-6:
                best_val = val_m["total"]
                bad_epochs = 0
                if cfg.save:
                    self.save(state, os.path.join(cfg.run_dir, "best"), epoch + 1)
            else:
                bad_epochs += 1
                if bad_epochs >= cfg.patience:  # early stop (train.py:19)
                    log(f"early stopping at epoch {epoch} (patience {cfg.patience})")
                    break
        if tb is not None:
            tb.close()
        if cfg.save_json:
            with open(os.path.join(cfg.run_dir, "results.json"), "w") as f:
                json.dump(history, f, indent=2)
        return state, history

    # --- checkpointing (orbax; SURVEY.md section 5 checkpoint/resume) ------
    def save(self, state: TrainState, path: str, epoch: int):
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        ckptr = ocp.StandardCheckpointer()
        # checkpoints carry the EMA weights as "params" (what inference should
        # load, matching upstream best.pt semantics) + the raw weights for resume
        infer_params = state.params if state.ema_params is None else state.ema_params
        payload = {
            "params": jax.device_get(infer_params),
            "params_raw": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
            "epoch": epoch,
        }
        ckptr.save(path, payload, force=True)
        ckptr.wait_until_finished()

    def load(self, path: str):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        payload = ckptr.restore(os.path.abspath(path))
        raw = payload.get("params_raw", payload["params"])
        state = TrainState(
            params=raw, batch_stats=payload["batch_stats"],
            opt_state=self.tx.init(raw), step=jnp.int32(0),
            ema_params=payload["params"] if self.cfg.ema else None,
        )
        return jax.device_put(state, self.repl_sharding), int(payload["epoch"])

    def evaluate_map(self, state: TrainState, conf: float = 0.001) -> dict:
        """COCO-style box mAP of the current (EMA) weights on the val split."""
        from ..pipeline.detector import Detector
        from .evaluate import evaluate_detector

        det = getattr(self, "_map_detector", None)
        if det is None:
            det = self._map_detector = Detector(
                self.export_variables(state), nc=self.nc, scale=self.cfg.scale,
                imgsz=self.cfg.imgsz,
                # evaluate_detector upgrades the candidate caps to mAP grade
                # (pre_nms 4096 / max_det 300) via eval_grade; build at that
                # size directly so the sweep reuses this compile
                pre_nms=4096, max_det=300,
            )
        else:
            # weights are an argument of the jitted predict program — swap
            # them on the cached instance instead of rebuilding (a fresh
            # Detector per epoch re-traces and re-compiles every epoch)
            det.variables = self.export_variables(state)
        samples = self.val_samples[: self.cfg.val_map_limit]
        return evaluate_detector(det, samples, imgsz=self.cfg.imgsz, conf=conf)

    def export_variables(self, state: TrainState) -> dict:
        """Inference-ready variables for pipeline.Detector."""
        p = state.params if state.ema_params is None else state.ema_params
        return {
            "params": jax.device_get(p),
            "batch_stats": jax.device_get(state.batch_stats),
        }


def train(**kwargs):
    """Keyword-compatible entry mirroring ultralytics ``model.train(...)``
    (reference detection/train.py:5-20)."""
    cfg = TrainConfig(**{k: v for k, v in kwargs.items() if hasattr(TrainConfig, k) or k in TrainConfig.__dataclass_fields__})
    tr = Trainer(cfg)
    state, history = tr.fit()
    return tr, state, history
