"""High-level training driver.

Counterpart of the reference's ``train()``
(``/root/reference/train_refinedet.py:101-277``): epoch loop over the
prefetching loader, warmup+step LR, per-iteration loss logging in the
reference's log line format, periodic epoch checkpoints (every 10, every 5
after epoch 200), and resume. The per-step work is one jitted SPMD program
(train/train_step.py); the host only shuttles batches and logs.
"""

from __future__ import annotations

import datetime
import time
from typing import Callable, Optional

import jax
import numpy as np

from refinedet_tpu.config import TrainConfig
from refinedet_tpu.data.loader import DataLoader
from refinedet_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from refinedet_tpu.train.checkpoints import CheckpointManager
from refinedet_tpu.train.schedule import make_lr_schedule
from refinedet_tpu.train.train_step import (TrainState, create_train_state,
                                            make_optimizer, make_train_step)


class Trainer:
    def __init__(self, model, dataset, train_cfg: TrainConfig,
                 save_folder: Optional[str] = None,
                 dataset_name: str = "COCO",
                 num_devices: Optional[int] = None,
                 log_fn: Callable[[str], None] = print,
                 log_every: int = 1,
                 live_plotter=None):
        self.model = model
        self.cfg = train_cfg
        self.dataset = dataset
        self.log = log_fn
        self.log_every = log_every
        self.live_plotter = live_plotter

        sp = max(1, train_cfg.spatial_shards)
        if sp > 1:
            import jax
            ndev_total = (num_devices if num_devices is not None
                          else len(jax.devices()))
            if ndev_total % sp:
                raise ValueError(
                    f"{ndev_total} devices not divisible by "
                    f"spatial_shards={sp}")
            self.mesh = make_mesh(ndev_total, ("data", "space"),
                                  shape=(ndev_total // sp, sp))
        else:
            self.mesh = make_mesh(num_devices)
        ndev = self.mesh.shape["data"]
        if train_cfg.batch_size % ndev:
            raise ValueError(
                f"batch_size {train_cfg.batch_size} not divisible by "
                f"{ndev} data-parallel devices")

        # Target validation + device_put both run in the producer thread:
        # the coordinate guard sees host arrays (no device sync), and
        # host->device staging overlaps with the previous step's device
        # compute instead of running serially in the train loop.
        def stage(batch):
            self._validate_batch(batch)
            return shard_batch(self.mesh, batch)

        # Multi-host: each process loads a disjoint shard (the loaders'
        # shuffles stay epoch-consistent because all hosts share the seed).
        from refinedet_tpu.parallel import distributed
        self.loader = DataLoader(
            dataset, train_cfg.batch_size, max_boxes=train_cfg.max_boxes,
            num_workers=train_cfg.num_workers, shuffle=True,
            seed=train_cfg.seed, device_put=stage,
            use_processes=train_cfg.worker_processes,
            shard_id=distributed.process_index(),
            num_shards=distributed.process_count(),
            drop_last=False)
        # The reference KEEPS the trailing partial batch (epoch_size =
        # math.ceil(len(dataset)/batch_size), train_refinedet.py:193).
        # Under static shapes the loader pads that batch with all-invalid
        # samples (zero loss/gradient, collate.pad_batch) — exact ceil
        # epoch/LR-boundary semantics at the same cached program shape.
        # epoch_size must match the steps the loader actually yields or
        # LR boundaries / resume math / ETA all drift.
        self.epoch_size = len(self.loader)
        self.max_iter = train_cfg.max_epoch * self.epoch_size
        self.lr_schedule = make_lr_schedule(
            train_cfg.lr, train_cfg.gamma, self.epoch_size,
            train_cfg.max_epoch, train_cfg.warmup_epochs,
            train_cfg.warmup_init_lr)
        self.tx = make_optimizer(self.lr_schedule, train_cfg.momentum,
                                 train_cfg.weight_decay,
                                 train_cfg.grad_clip_norm)
        self.train_step = make_train_step(
            model, self.tx, train_cfg, self.mesh,
            on_device_augment=train_cfg.on_device_augment,
            augment_mean=train_cfg.mean)
        self.ckpt = (CheckpointManager(
            save_folder, f"RefineDet{model.size}_{dataset_name}")
            if save_folder else None)

    def init_state(self) -> TrainState:
        state = create_train_state(
            self.model, jax.random.PRNGKey(self.cfg.seed), self.tx,
            ema=self.cfg.ema_decay > 0)
        return replicate(self.mesh, state)

    def resume(self, epoch: int) -> TrainState:
        want_ema = self.cfg.ema_decay > 0

        def template(ema: bool):
            return jax.tree.map(np.asarray, create_train_state(
                self.model, jax.random.PRNGKey(self.cfg.seed), self.tx,
                ema=ema))

        try:
            state = self.ckpt.restore(epoch, template(want_ema))
        except Exception as first_err:
            # An EMA on/off mismatch between --ema_decay and the
            # checkpoint surfaces as an opaque Orbax tree-structure error
            # (ADVICE r3): retry with the flipped template and reconcile.
            try:
                state = self.ckpt.restore(epoch, template(not want_ema))
            except Exception:
                raise first_err  # genuinely incompatible checkpoint
            if want_ema:
                self.log(f"checkpoint epoch {epoch} has no EMA state; "
                         "initializing EMA from the restored params "
                         "(--ema_decay turned on at resume)")
                state = state.replace(
                    ema_params=jax.tree.map(np.copy, state.params))
            else:
                self.log(f"checkpoint epoch {epoch} carries EMA state but "
                         "--ema_decay is 0; dropping it (pass --ema_decay "
                         "to keep tracking)")
                state = state.replace(ema_params=None)
        return replicate(self.mesh, state)

    def _maybe_checkpoint(self, state, epoch: int):
        if self.ckpt is None or epoch <= 0:
            return
        # Reference cadence: every 10 epochs, every 5 after 200
        # (train_refinedet.py:227-229).
        if epoch % 10 == 0 or (epoch > 200 and epoch % 5 == 0):
            self.ckpt.save(state, epoch)

    def _validate_batch(self, batch) -> None:
        """Target sanity guard, counterpart of the reference's coordinate
        check (train_refinedet.py:241-245) — but raising a descriptive
        error instead of silently killing iteration via StopIteration.
        Skipped when targets are staging-pixel coords (on-device aug)."""
        if self.cfg.on_device_augment:
            return
        coords = batch.boxes[batch.valid]
        if coords.size and (coords.min() < -1e-3 or coords.max() > 1 + 1e-3):
            raise ValueError(
                f"target coords outside [0, 1]: min {coords.min():.4f} "
                f"max {coords.max():.4f} — dataset/transform mismatch?")

    def _install_preemption_handler(self):
        """SIGTERM/SIGINT set a flag; the epoch loop checkpoints and exits
        cleanly at the next step boundary. The reference has no failure
        story (SURVEY.md §5.3) — on preemptible TPU pools this turns a
        kill into a resumable '<prefix>_epoches_preempt_e<N>' checkpoint.
        Returns a restore-fn for the previous handlers."""
        import signal

        self._preempted = False
        prev = {}

        def mark(signum, frame):
            self._preempted = True

        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                prev[sig] = signal.signal(sig, mark)
            except ValueError:  # not the main thread — skip
                return lambda: None

        def restore():
            for sig, h in prev.items():
                signal.signal(sig, h)

        return restore

    def train(self, state: Optional[TrainState] = None,
              start_epoch: int = 0,
              max_epochs: Optional[int] = None) -> TrainState:
        state = state if state is not None else self.init_state()
        end_epoch = min(self.cfg.max_epoch,
                        (start_epoch + max_epochs) if max_epochs
                        else self.cfg.max_epoch)
        iteration = start_epoch * self.epoch_size
        # A resumed run must continue the shuffle/augmentation stream, not
        # replay epoch 0's draws.
        self.loader.epoch = start_epoch
        # Metrics are logged one step DELAYED: device_get on the step just
        # dispatched would block the host on the whole device program and
        # serialize staging with compute. By fetching step i's metrics only
        # after dispatching step i+1, the host stays one step ahead and the
        # loader/device pipeline runs back-to-back (the reference prints
        # synchronously every iter, train_refinedet.py:263-267 — same log
        # format here, just pipelined).
        pending = None  # (iteration, epoch, device_metrics)
        last_t = time.time()
        last_iter = iteration

        def flush(pending):
            nonlocal last_t, last_iter
            it, ep, dev_metrics = pending
            metrics = jax.device_get(dev_metrics)
            now = time.time()
            bt = (now - last_t) / max(1, it - last_iter)
            last_t, last_iter = now, it
            lr = float(self.lr_schedule(it - 1))
            eta = int(bt * (self.max_iter - it))
            self.log(
                f"Epoch:{ep}/{self.cfg.max_epoch} || "
                f"Epochiter: {((it - 1) % self.epoch_size) + 1}"
                f"/{self.epoch_size} || Iter: {it}"
                f"/{self.max_iter} || "
                f"ARM_L Loss: {metrics['arm_loss_l']:.4f} "
                f"ARM_C Loss: {metrics['arm_loss_c']:.4f} "
                f"ODM_L Loss: {metrics['odm_loss_l']:.4f} "
                f"ODM_C Loss: {metrics['odm_loss_c']:.4f} "
                f"loss: {metrics['loss']:.4f} || "
                f"LR: {lr:.8f} || Batchtime: {bt:.4f} s || "
                f"ETA: {datetime.timedelta(seconds=eta)}")
            if self.live_plotter is not None:
                self.live_plotter.update(it, metrics)

        restore_signals = self._install_preemption_handler()
        for epoch in range(start_epoch + 1, end_epoch + 1):
            self._maybe_checkpoint(state, epoch - 1)
            for sb in self.loader:  # already validated + device-staged
                if self._preempted:
                    break
                state, metrics = self.train_step(
                    state, sb.images, sb.boxes, sb.labels, sb.valid)
                iteration += 1
                if pending is not None:
                    flush(pending)
                    pending = None
                if iteration % self.log_every == 0:
                    pending = (iteration, epoch, metrics)
            if self.live_plotter is not None:
                if pending is not None:
                    flush(pending)
                    pending = None
                self.live_plotter.end_epoch(epoch)
            if self._preempted:
                if pending is not None:
                    flush(pending)
                    pending = None
                if self.ckpt is not None:
                    path = self.ckpt.save(state, f"preempt_e{epoch}")
                    self.log(f"preemption signal: checkpointed to {path}")
                restore_signals()
                return state
        if pending is not None:
            flush(pending)
        restore_signals()
        # The last epoch's numbered checkpoint (the cadence check at the
        # top of each epoch only covers epoch-1), then the 'final' alias.
        self._maybe_checkpoint(state, end_epoch)
        if self.ckpt is not None:
            self.ckpt.save(state, "final")
        return state
