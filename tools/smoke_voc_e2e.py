"""21-class VOC end-to-end smoke THROUGH THE REAL CLIs (verdict item #2).

Exercises the reference's headline path (train_refinedet.py:124-127 ->
eval_refinedet_voc.py:366-415 flow): synthetic shape-coded VOCdevkit
-> `train_refinedet.py --dataset VOC --input_size 320` (21-class model,
VOC_MEANS, SSDAugmentation, warmup LR schedule, Orbax checkpoints) ->
`eval_refinedet_voc.py` on the final checkpoint (label +1 shift, no-+1 NMS
convention, per-class VOC result files, 11-point AP) -> assert the mean AP
over the classes present in the fixture clears a learnability threshold ->
re-evaluate the same checkpoint with `--int8` (PTQ serving path) and
assert the mean-AP drop stays within --int8_max_drop.

Runs anywhere JAX has a device; ~4 min on the TPU chip (most of it
compile), ~30 min on the 1-core CPU host.

Usage: python tools/smoke_voc_e2e.py [--max_epoch N] [--threshold F]
"""

import argparse
import os
import os.path as osp
import sys
import tempfile
import time

_repo = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, _repo)
sys.path.insert(0, osp.join(_repo, "tests"))

# Four classes encoded by SILHOUETTE (filled rect / ellipse / triangle /
# thick cross) — color-coded classes are unlearnable through
# SSDAugmentation's photometric distortion (hue jitter + random channel
# shuffle), and fine textures are erased by Expand's up-to-4x shrink.
CLASSES = ("aeroplane", "bicycle", "boat", "car")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--max_epoch", default=150, type=int)
    p.add_argument("--batch_size", default=8, type=int)
    p.add_argument("--lr", default=5e-4, type=float)
    p.add_argument("--num_train", default=64, type=int)
    p.add_argument("--num_test", default=16, type=int)
    p.add_argument("--threshold", default=0.30, type=float,
                   help="min mean AP over the present classes")
    p.add_argument("--skip_int8", action="store_true",
                   help="skip the int8 re-evaluation pass")
    p.add_argument("--int8_max_drop", default=0.10, type=float,
                   help="max tolerated (bf16 - int8) mean-AP delta")
    p.add_argument("--root", default=None, help="reuse a fixture/workdir")
    p.add_argument("--seed", default=0, type=int,
                   help="training seed (init + augmentation stream), "
                        "forwarded to train_refinedet.py; the fixture "
                        "stays fixed so N seeds measure the train/serve "
                        "variance on identical data")
    p.add_argument("--ema_decay", default=0.0, type=float,
                   help=">0: train with an EMA of the weights and add an "
                        "eval pass serving them (--use_ema)")
    args = p.parse_args()

    from data_fixtures import make_voc_dataset

    work = args.root or tempfile.mkdtemp(prefix="voc_e2e_")
    voc_root = osp.join(work, "VOCdevkit")
    if not osp.exists(osp.join(voc_root, "VOC2007")):
        # the train driver follows the reference's VOC0712 recipe
        # (2007 trainval + 2012 trainval; test on 2007-test)
        half = args.num_train // 2
        make_voc_dataset(voc_root, year="2007", image_set="trainval",
                         num_images=half, img_size=160, seed=3,
                         classes=CLASSES, class_patterns=True)
        make_voc_dataset(voc_root, year="2012", image_set="trainval",
                         num_images=args.num_train - half, img_size=160,
                         seed=4, classes=CLASSES, class_patterns=True)
        make_voc_dataset(voc_root, year="2007", image_set="test",
                         num_images=args.num_test, img_size=160, seed=77,
                         classes=CLASSES, class_patterns=True)
    save = osp.join(work, "weights") + "/"

    import train_refinedet
    import eval_refinedet_voc

    t0 = time.time()
    sys.argv = ["train_refinedet.py", "--dataset", "VOC",
                "--input_size", "320", "--dataset_root", voc_root,
                "--batch_size", str(args.batch_size),
                "--lr", str(args.lr), "--grad_clip", "5.0",
                "--max_epoch", str(args.max_epoch),
                "--ema_decay", str(args.ema_decay), "--seed", str(args.seed),
                "--num_workers", "2", "--save_folder", save]
    train_refinedet.main()
    t_train = time.time() - t0
    ckpt = osp.join(save, "RefineDet320_VOC_epoches_final")
    assert osp.exists(ckpt), ckpt

    t0 = time.time()
    sys.argv = ["eval_refinedet_voc.py", "--input_size", "320",
                "--voc_root", voc_root, "--trained_model", ckpt,
                "--batch_size", str(args.batch_size),
                "--save_folder", osp.join(work, "eval") + "/"]
    aps = eval_refinedet_voc.main()
    t_eval = time.time() - t0

    present = {c: aps[c] for c in CLASSES}
    mean_present = sum(present.values()) / len(present)
    print(f"VOC e2e: train {t_train:.0f}s, eval {t_eval:.0f}s; "
          f"per-class AP over present classes: "
          f"{ {k: round(v, 4) for k, v in present.items()} }")
    print(f"VOC e2e: mean AP (present classes) = {mean_present:.4f} "
          f"(threshold {args.threshold})")
    assert mean_present >= args.threshold, (
        f"mean AP {mean_present:.4f} below {args.threshold}")

    if args.ema_decay > 0:
        # EMA serving pass: same checkpoint, --use_ema picks ema_params.
        t0 = time.time()
        sys.argv = ["eval_refinedet_voc.py", "--input_size", "320",
                    "--voc_root", voc_root, "--trained_model", ckpt,
                    "--batch_size", str(args.batch_size), "--use_ema",
                    "--save_folder", osp.join(work, "eval_ema") + "/"]
        aps_ema = eval_refinedet_voc.main()
        t_ema = time.time() - t0
        present_ema = {c: aps_ema[c] for c in CLASSES}
        mean_ema = sum(present_ema.values()) / len(present_ema)
        print(f"VOC e2e EMA(d={args.ema_decay}): eval {t_ema:.0f}s; "
              f"mean AP (present) = {mean_ema:.4f}  "
              f"delta vs raw = {mean_ema - mean_present:+.4f}")

    if not args.skip_int8:
        # int8 PTQ serving pass through the SAME real CLI on the SAME
        # trained checkpoint (round-2 verdict item #6: the int8 path gets
        # an end-to-end artifact on trained weights, not just unit tests
        # + synthetic ablation). calib_study.py finding folded in:
        # p9999 activation clipping, DEFAULT_QUANT_SKIP.
        t0 = time.time()
        sys.argv = ["eval_refinedet_voc.py", "--input_size", "320",
                    "--voc_root", voc_root, "--trained_model", ckpt,
                    "--batch_size", str(args.batch_size),
                    "--save_folder", osp.join(work, "eval_int8") + "/",
                    "--int8", "--calib_images", "16"]
        aps8 = eval_refinedet_voc.main()
        t_int8 = time.time() - t0
        present8 = {c: aps8[c] for c in CLASSES}
        mean8 = sum(present8.values()) / len(present8)
        drop = mean_present - mean8
        print(f"VOC e2e int8: eval {t_int8:.0f}s; mean AP (present) = "
              f"{mean8:.4f}  delta vs bf16 = {drop:+.4f} "
              f"(max tolerated drop {args.int8_max_drop})")
        assert drop <= args.int8_max_drop, (
            f"int8 mean-AP drop {drop:.4f} exceeds {args.int8_max_drop}")

    print("VOC e2e smoke PASSED")


if __name__ == "__main__":
    main()
