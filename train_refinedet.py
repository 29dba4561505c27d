#!/usr/bin/env python
"""RefineDet training driver (CLI parity with the reference's
``train_refinedet.py``).

Flow (reference call stack SURVEY.md §3.1, re-done TPU-first): dataset +
SSDAugmentation -> build_refinedet -> optional pretrained-VGG import ->
data-parallel mesh over all local devices -> jitted SPMD train step with
warmup+step LR, SGD momentum + weight decay -> Orbax checkpoints every
10 epochs (5 after 200) -> log.txt-compatible logging.
"""

import argparse
import os

from refinedet_tpu import config as C
from refinedet_tpu.config import TrainConfig
from refinedet_tpu.data import COCODetection, SSDAugmentation, VOCDetection
from refinedet_tpu.models import build_refinedet
from refinedet_tpu.train import Trainer
from refinedet_tpu.utils import logger as log_util


def parse_args():
    p = argparse.ArgumentParser(
        description="RefineDet training (TPU-native JAX)")
    p.add_argument("--dataset", default="COCO", choices=["VOC", "COCO"])
    p.add_argument("--input_size", default="512",
                   choices=["320", "512", "896"],
                   help="896 is the five-source large-input variant")
    p.add_argument("--dataset_root", default=None,
                   help="VOCdevkit or SSDD_coco root")
    p.add_argument("--basenet", default=None,
                   help="pretrained VGG .pth (vgg16_reducedfc)")
    p.add_argument("--batch_size", default=32, type=int)
    p.add_argument("--resume", default=None,
                   help="checkpoint path or epoch number to resume from")
    p.add_argument("--resume_epoch", default=0, type=int)
    p.add_argument("--num_workers", default=8, type=int)
    p.add_argument("--worker_processes", action="store_true",
                   help="load/augment in spawned worker processes (the "
                        "reference's DataLoader-worker model) instead of "
                        "threads — use on multi-core hosts where the "
                        "GIL-bound augmentation limits throughput")
    p.add_argument("--lr", "--learning-rate", default=1e-3, type=float)
    p.add_argument("--momentum", default=0.9, type=float)
    p.add_argument("--weight_decay", default=5e-4, type=float)
    p.add_argument("--gamma", default=0.1, type=float)
    p.add_argument("--max_epoch", default=300, type=int)
    p.add_argument("--ngpu", default=None, type=int,
                   help="number of devices (default: all local)")
    p.add_argument("--save_folder", default="weights/")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--bn", action="store_true",
                   help="use the BatchNorm model variant")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"],
                   help="compute dtype for conv stacks")
    p.add_argument("--on_device_augment", action="store_true",
                   help="run the SSD augmentation chain on the TPU, fused "
                        "into the train step (host only stages images)")
    p.add_argument("--staging_size", default=0, type=int,
                   help="staging canvas for --on_device_augment (uint8, "
                        "host->device). Default 2x input_size; lower it "
                        "to cut transfer volume on thin hosts")
    p.add_argument("--grad_clip", default=0.0, type=float)
    p.add_argument("--ema_decay", default=0.0, type=float,
                   help="keep an EMA of the weights for serving (0 = off, "
                        "the reference's behavior); checkpoints then carry "
                        "ema_params, selected at eval with --use_ema")
    p.add_argument("--spatial_shards", default=1, type=int,
                   help="shard image height over a 'space' mesh axis "
                        "(devices = data_parallel x spatial_shards); for "
                        "very large inputs, e.g. the 896 variant")
    p.add_argument("--visdom", "--live_plot", dest="live_plot",
                   action="store_true",
                   help="live loss visualization: re-render "
                        "<save_folder>/live_loss.png as training runs "
                        "(counterpart of the reference's --visdom)")
    return p.parse_args()


def main():
    args = parse_args()
    os.makedirs(args.save_folder, exist_ok=True)
    log_util.install(os.path.join(args.save_folder, "log.txt"))

    size = int(args.input_size)
    means = C.VOC_MEANS if args.dataset == "VOC" else C.MEANS
    if args.on_device_augment:
        from refinedet_tpu.data.augment_jax import StagingTransform
        transform = StagingTransform(args.staging_size or 2 * size)
    else:
        transform = SSDAugmentation(size, means)
    if args.dataset == "VOC":
        root = args.dataset_root or C.VOC_ROOT
        dataset = VOCDetection(root, transform=transform, seed=args.seed)
        num_classes = 21
    else:
        root = args.dataset_root or C.COCOroot
        dataset = COCODetection(root, [("sarship", "train")], transform,
                                seed=args.seed)
        num_classes = dataset.num_classes

    import jax.numpy as jnp
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = build_refinedet("train", size, num_classes, use_bn=args.bn,
                            dtype=dtype)
    cfg = TrainConfig(
        batch_size=args.batch_size, lr=args.lr, momentum=args.momentum,
        weight_decay=args.weight_decay, gamma=args.gamma,
        max_epoch=args.max_epoch, num_workers=args.num_workers,
        worker_processes=args.worker_processes,
        seed=args.seed, grad_clip_norm=args.grad_clip,
        ema_decay=args.ema_decay,
        on_device_augment=args.on_device_augment, mean=tuple(means),
        spatial_shards=args.spatial_shards)
    live = None
    if args.live_plot:
        from refinedet_tpu.utils.plot import LivePlotter
        live = LivePlotter(args.save_folder)
    trainer = Trainer(model, dataset, cfg, save_folder=args.save_folder,
                      dataset_name=args.dataset, num_devices=args.ngpu,
                      live_plotter=live)

    start_epoch = 0
    state = None
    if args.resume_epoch > 0:
        state = trainer.resume(args.resume_epoch)
        start_epoch = args.resume_epoch
        print(f"resumed from epoch {start_epoch}")
    elif args.resume:
        import jax
        import numpy as np
        template = jax.tree.map(np.asarray, trainer.init_state())
        state = trainer.ckpt.restore_path(args.resume, template)
        start_epoch = int(np.asarray(state.step)) // trainer.epoch_size
        print(f"resumed from {args.resume} (epoch {start_epoch})")
    elif args.basenet:
        from refinedet_tpu.models.torch_import import load_weights
        state = trainer.init_state()
        params = load_weights(dict(state.params), args.basenet)
        if not isinstance(state.params, dict):
            params = type(state.params)(params)
        state = state.replace(params=params)
        if state.ema_params is not None:
            # EMA must start from the warm-start weights, not the random
            # init create_train_state copied before the load (ADVICE r3).
            import jax
            import jax.numpy as jnp
            state = state.replace(
                ema_params=jax.tree.map(jnp.copy, state.params))
        print(f"loaded pretrained backbone from {args.basenet}")

    print("Loading the dataset...")
    print(f"Training RefineDet{size} on {dataset.name} "
          f"({len(dataset)} images, {trainer.mesh.devices.size} devices)")
    trainer.train(state, start_epoch=start_epoch)

    # Post-hoc loss curves from the log (plot_curve.py parity).
    from refinedet_tpu.utils.plot import plot_loss
    plot_loss(os.path.join(args.save_folder, "log.txt"),
              os.path.join(args.save_folder, "loss_curve.png"))


if __name__ == "__main__":
    main()
