"""High-level training/evaluation driver.

The TPU-native counterpart of reference `DiffusionTrainer`
(diffusion_trainer.py): epoch/step loops, per-epoch checkpoints, best-model
selection by max val nss+cc+sim, TSV logging, prediction image dumping, and
the 3-split audio-visual fine-tune protocol (train_av_data, :139-298).
Device math lives in jitted steps (train_step.py); this module owns only
orchestration, IO and bookkeeping.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from diff_sal_tpu.config import ExperimentConfig
from diff_sal_tpu.diffusion.schedule import make_schedule
from diff_sal_tpu.models.diff_model import VideoSaliencyModel, param_counts
from diff_sal_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh_for_batch,
    shard_batch,
)
from diff_sal_tpu.train.checkpoint import CheckpointManager, partial_load
from diff_sal_tpu.train.optim import make_optimizer_and_schedule
from diff_sal_tpu.train.train_step import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
)
from diff_sal_tpu.utils.logging import (
    AverageMeterDict,
    StepTimer,
    TSVLogger,
    save_saliency_image,
)

ARRAY_KEYS = ("rgb", "salmap", "audio", "wave", "valid")


def _device_batch(batch: Dict) -> Dict:
    return {k: batch[k] for k in ARRAY_KEYS if k in batch}


class Trainer:
    def __init__(
        self,
        cfg: ExperimentConfig,
        workdir: str,
        steps_per_epoch: int,
        n_epochs: Optional[int] = None,
        use_mesh: bool = True,
    ):
        self.cfg = cfg
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)
        self.model = VideoSaliencyModel(cfg.model)
        self.schedule = make_schedule(
            cfg.diffusion.beta_schedule,
            cfg.diffusion.beta_start,
            cfg.diffusion.beta_end,
            cfg.diffusion.num_diffusion_timesteps,
        )
        self.n_epochs = n_epochs or cfg.training.n_epochs
        # lr schedule shared with the optimizer so the logged lr is the one
        # actually applied (reference logs the live optimizer lr each epoch:
        # diffusion_trainer.py:430, util/utils.py:88)
        self.tx, self.lr_schedule = make_optimizer_and_schedule(
            cfg.optim, steps_per_epoch, self.n_epochs
        )
        self.ckpt = CheckpointManager(os.path.join(workdir, "weights"))

        self.mesh = (
            make_mesh_for_batch(cfg.training.batch_size) if use_mesh else None
        )
        if self.mesh is not None and self.mesh.size == 1:
            # a 1-device mesh adds nothing; plain jit avoids the sharded
            # device_put path (which can wedge on tunneled single-TPU devs)
            self.mesh = None
        step_fn = make_train_step(self.model, self.schedule, cfg)
        eval_fn = make_eval_step(self.model, self.schedule, cfg)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(self.mesh, P())
            data = batch_sharding(self.mesh)
            self._repl = repl
            self.train_step = jax.jit(
                step_fn, in_shardings=(repl, data, repl),
                out_shardings=(repl, repl),
            )
            self.eval_step = jax.jit(
                eval_fn, in_shardings=(repl, data, repl),
                out_shardings=(repl, data),
            )
        else:
            self._repl = None
            self.train_step = jax.jit(step_fn)
            self.eval_step = jax.jit(eval_fn)
        self.state: Optional[TrainState] = None
        self.global_step = 0
        self.epoch = 0

    # ------------------------------------------------------------------
    def init_state(self, sample_batch: Dict, rng: Optional[jax.Array] = None):
        rng = rng if rng is not None else jax.random.PRNGKey(self.cfg.training.seed)
        data = {
            "rgb": jnp.asarray(sample_batch["rgb"][:1]),
            "input": jnp.zeros(
                (1,) + tuple(self.cfg.model.decoder.img_size) + (1,)
            ),
        }
        if "audio" in sample_batch:
            data["audio"] = jnp.asarray(sample_batch["audio"][:1])
        elif "wave" in sample_batch:
            from diff_sal_tpu.audio.mel import device_audio_frontend
            from diff_sal_tpu.train.train_step import audio_hw_for

            data["audio"] = device_audio_frontend(
                jnp.asarray(sample_batch["wave"][:1], jnp.float32),
                audio_hw_for(self.cfg),
            )
        # jit the init: eagerly it dispatches thousands of individual ops
        # (minutes over a remote-device tunnel, and no compile cache)
        variables = jax.jit(self.model.init)(rng, data, jnp.zeros((1,)))
        print("param counts (M):", param_counts(variables))
        self.state = create_train_state(
            self.model, variables, self.tx, use_ema=self.cfg.training.ema
        )
        if self.mesh is not None:
            self.state = jax.device_put(self.state, self._repl)
        return self.state

    def warm_start(self, source_params):
        """strict=0 partial load (reference model.py:17-22)."""
        merged, loaded, skipped = partial_load(self.state.params, source_params)
        self.state = self.state.replace(params=merged)
        print(f"warm start: {loaded} leaves loaded, {skipped} kept")

    def resume(self):
        if self.state is None:
            raise RuntimeError("init_state first")
        restored = self.ckpt.restore(template=_restore_template(self.state))
        if restored is not None:
            self.state = self.state.replace(
                params=restored["params"],
                opt_state=restored["opt_state"],
                batch_stats=restored["batch_stats"],
                step=restored["step"],
            )
            # continue AFTER the last completed epoch
            self.epoch = int(restored["epoch"]) + 1
            self.global_step = int(restored["step"])
            print(f"resumed at epoch {self.epoch}, step {self.global_step}")

    def restore_best(self):
        """Load the best-scoring checkpoint's params/batch_stats (reference
        test_av_data loads {split}_weights/best.pth, diffusion_trainer.py:
        848-854)."""
        if self.state is None:
            raise RuntimeError("init_state first")
        restored = self.ckpt.restore_best(template=_restore_template(self.state))
        if restored is None:
            raise FileNotFoundError(
                f"no best checkpoint under {self.ckpt.directory}"
            )
        self.state = self.state.replace(
            params=restored["params"], batch_stats=restored["batch_stats"]
        )
        print(f"loaded best checkpoint (epoch {int(restored['epoch'])})")

    def _save(self, epoch: int):
        payload = {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "batch_stats": self.state.batch_stats,
            "step": int(self.state.step),
            "epoch": epoch,
        }
        self.ckpt.save(epoch, payload)

    # ------------------------------------------------------------------
    def fit(self, train_loader, val_loader=None, log_name: str = "train"):
        cfg = self.cfg
        rng = jax.random.PRNGKey(cfg.training.seed + 1)
        logger = TSVLogger(
            os.path.join(self.workdir, f"{log_name}.log"),
            ["epoch", "total_step", "loss", "main", "cc", "sim", "nss", "lr"],
        )
        val_logger = TSVLogger(
            os.path.join(self.workdir, f"{log_name}_val.log"),
            ["epoch", "total", "kl", "cc", "sim", "nss"],
        )
        for epoch in range(self.epoch, self.n_epochs):
            train_loader.set_epoch(epoch)
            meters = AverageMeterDict()
            timer = StepTimer()
            # device metrics are materialized lazily (only at log points):
            # a per-step float() would sync the host every step and stop the
            # input pipeline from overlapping with the accelerator
            pending = []
            for batch in train_loader:
                timer.mark_data()
                rng, step_rng = jax.random.split(rng)
                db = _device_batch(batch)
                if self.mesh is not None:
                    db = shard_batch(db, self.mesh)
                self.state, metrics = self.train_step(self.state, db, step_rng)
                pending.append(metrics)
                self.global_step += 1
                timer.mark_step()
                if self.global_step % cfg.training.log_freq == 0:
                    for p in pending:
                        meters.update({k: float(v) for k, v in p.items()})
                    pending = []
                    print(
                        f"epoch {epoch} step {self.global_step} "
                        f"loss {meters.averages()['total']:.4f} "
                        f"data {timer.data_time.avg:.3f}s "
                        f"step {timer.step_time.avg:.3f}s"
                    )
            for p in pending:
                meters.update({k: float(v) for k, v in p.items()})
            avg = meters.averages()
            logger.log(
                dict(
                    epoch=epoch,
                    total_step=self.global_step,
                    loss=avg.get("total"),
                    main=avg.get("main"),
                    cc=avg.get("cc"),
                    sim=avg.get("sim"),
                    nss=avg.get("nss"),
                    lr=float(self.lr_schedule(self.global_step)),
                )
            )
            self._save(epoch)
            if val_loader is not None:
                scores = self.evaluate(val_loader)
                val_logger.log(dict(epoch=epoch, **scores))
                if self.ckpt.update_best(epoch, scores["total"]):
                    print(f"new best at epoch {epoch}: {scores['total']:.4f}")
            self.epoch = epoch + 1
        return self.state

    # ------------------------------------------------------------------
    def evaluate(
        self, loader, save_images_dir: Optional[str] = None,
        use_ema: bool = False, rng: Optional[jax.Array] = None,
    ) -> Dict[str, float]:
        """Validation/test loop (reference val/test/test_av_data,
        diffusion_trainer.py:642-896): sample with the configured sampler,
        average nss+cc+sim over the *full* set (not a rank shard).

        Noise rng: fixed key by default (deterministic checkpoint ranking);
        `training.eval_fixed_rng=False` draws a fresh seed per evaluation,
        matching the reference's fresh randn per run
        (diffusion_trainer.py:118-120)."""
        meters = AverageMeterDict()
        if rng is None:
            if self.cfg.training.eval_fixed_rng:
                rng = jax.random.PRNGKey(0)
            else:
                rng = jax.random.PRNGKey(
                    int.from_bytes(os.urandom(4), "little")
                )
        state = self.state
        if use_ema and state.ema_params is not None:
            from diff_sal_tpu.train.ema import swap_in_ema

            state = swap_in_ema(state, state.ema_params)
        for batch in loader:
            rng, step_rng = jax.random.split(rng)
            db = _device_batch(batch)
            if self.mesh is not None:
                db = shard_batch(db, self.mesh)
            scores, pred = self.eval_step(state, db, step_rng)
            # padded tail batches (Loader pad_last) carry a "valid" mask;
            # eval_step already excludes pads from the averages — weight the
            # meter by the real count too
            n = (
                int(batch["valid"].sum())
                if "valid" in batch
                else batch["rgb"].shape[0]
            )
            meters.update({k: float(v) for k, v in scores.items()}, n)
            if save_images_dir:
                self._dump_images(batch, pred, save_images_dir)
        return meters.averages()

    def _dump_images(self, batch, pred, out_dir: str):
        """Write pred maps with the reference's path contract
        (diffusion_trainer.py:884-935): AV '<ds>/<vid>/pred_sal_%06d.jpg',
        visual '<vid>/<gid>.png'. `pred` is the eval_step's sampled
        prediction — the scored and dumped maps are the same arrays, one
        inference pass per batch (reference samples once too,
        diffusion_trainer.py:856-885)."""
        pred = np.asarray(pred)
        for i in range(pred.shape[0]):
            vid = batch["video_id"][i]
            gid = int(np.asarray(batch["gt_index"][i]))
            if "/" in str(vid):  # AV contract
                path = os.path.join(out_dir, str(vid), "pred_sal_%06d.jpg" % gid)
            else:
                path = os.path.join(out_dir, str(vid), "%04d.png" % gid)
            save_saliency_image(path, pred[i])


def _restore_template(state: TrainState) -> Dict:
    return {
        "params": state.params,
        "opt_state": state.opt_state,
        "batch_stats": state.batch_stats,
        "step": int(state.step),
        "epoch": 0,
    }


def train_av_splits(
    cfg: ExperimentConfig,
    data_config: dict,
    workdir: str,
    visual_best_params=None,
    splits: Iterable[str] = ("split1", "split2", "split3"),
    loader_kwargs: Optional[dict] = None,
    packed_root: Optional[str] = None,
):
    """The 3-split AV fine-tune protocol (reference train_av_data,
    diffusion_trainer.py:139-298): one independent training per split, each
    warm-started from the visual best checkpoint.

    `packed_root` switches to the decode-free memmap pipeline
    (data/packed.py PackedAVDataset: uint8 frames + 16 kHz wave excerpts,
    normalization and log-mel both on device inside the jitted step)."""
    from diff_sal_tpu.data.av_dataset import build_av_datasets
    from diff_sal_tpu.data.loader import Loader

    if packed_root is not None and cfg.model.uint8_norm != "stavis":
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(cfg.model, uint8_norm="stavis"),
        )
    loader_kwargs = loader_kwargs or {}
    results = {}
    for split in splits:
        if packed_root is not None:
            from diff_sal_tpu.data.packed import PackedAVDataset

            train_ds = PackedAVDataset(
                packed_root, data_config, split, train=True
            )
            val_ds = PackedAVDataset(
                packed_root, data_config, split, train=False
            )
        else:
            train_ds = build_av_datasets(data_config, split, train=True)
            val_ds = build_av_datasets(data_config, split, train=False)
        bs = cfg.training.batch_size
        train_loader = Loader(train_ds, bs, shuffle=True, **loader_kwargs)
        val_loader = Loader(val_ds, bs, shuffle=False, **loader_kwargs)
        t = Trainer(
            cfg,
            os.path.join(workdir, split),
            steps_per_epoch=max(len(train_loader), 1),
            n_epochs=cfg.training.n_epochs_for_av_data,
        )
        t.init_state(next(iter(train_loader)))
        if visual_best_params is not None:
            t.warm_start(visual_best_params)
        t.fit(train_loader, val_loader, log_name=split)
        results[split] = t
    return results
