"""Worker script for the 2-process jax.distributed equivalence test.

Each process contributes 4 forced-CPU devices to a global 8-device 1-D
data mesh, loads the SAME synthetic COCO fixture, takes its contiguous
per-process shard of every global batch (the DataLoader shard_id/num_shards
contract, refinedet_tpu/data/loader.py), assembles global arrays with
``jax.make_array_from_process_local_data``, and runs 3 shared-seed SPMD
train steps. The final (replicated) params are summarized to an .npz for
the parent test to compare across processes and against the single-process
8-device run.

Invoked as:
  python distributed_worker.py <coordinator|-> <nproc> <pid> <data_root> <out.npz>
(``-`` coordinator = single-process mode, no jax.distributed)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 3
GLOBAL_BATCH = 8
SIZE = 320
MAX_BOXES = 8


def _global_batch(ds, step):
    """Deterministic global batch for one step: resize + mean-sub +
    normalized boxes, fixed index schedule (no shuffle)."""
    import cv2
    from refinedet_tpu import config as C
    from refinedet_tpu.data.collate import detection_collate

    samples = []
    for j in range(GLOBAL_BATCH):
        img, target = ds.pull_image((step * GLOBAL_BATCH + j) % len(ds))
        h, w = img.shape[:2]
        x = cv2.resize(img, (SIZE, SIZE)).astype(np.float32) - C.MEANS
        boxes = target[:, :4] / np.array([w, h, w, h], np.float32)
        labels = target[:, 4].astype(np.int32)
        samples.append((x, boxes, labels))
    return detection_collate(samples, max_boxes=MAX_BOXES)


def main():
    coord, nproc, pid, data_root, out_path = sys.argv[1:6]
    nproc, pid = int(nproc), int(pid)

    from refinedet_tpu.parallel import distributed
    if coord != "-":
        assert distributed.maybe_initialize(coord, nproc, pid)

    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert distributed.process_index() == pid

    def barrier(name):
        if coord != "-":
            from jax._src import distributed as _jd
            _jd.global_state.client.wait_at_barrier(name, 1_200_000)

    from refinedet_tpu.config import TrainConfig
    from refinedet_tpu.data import COCODetection
    from refinedet_tpu.models import build_refinedet
    from refinedet_tpu.parallel import batch_sharding, make_mesh
    from refinedet_tpu.train import (create_train_state, make_optimizer,
                                     make_train_step)

    ds = COCODetection(data_root, [("sarship", "train")], None)
    model = build_refinedet("train", SIZE, ds.num_classes)
    cfg = TrainConfig(batch_size=GLOBAL_BATCH, max_boxes=MAX_BOXES)
    # Small constant LR + global-norm clip: a from-scratch init at the
    # reference LR (1e-3, no warmup) diverges to NaN within 2 steps — this
    # test checks multi-process EQUIVALENCE, not learnability, so keep the
    # 3 steps numerically tame.
    tx = make_optimizer(lambda s: 1e-5, grad_clip_norm=5.0)

    mesh = make_mesh()  # all 8 GLOBAL devices
    repl = NamedSharding(mesh, P())
    data = batch_sharding(mesh)

    # Establish the 8-rank Gloo clique with a trivially-compiled psum while
    # both processes are in lockstep: XLA CPU's clique rendezvous has a
    # fixed ~30 s key-value deadline, far shorter than the train step's
    # compile-time skew on a busy 1-core host. The train step reuses the
    # communicator created here.
    barrier("pre-clique")
    probe = jax.make_array_from_process_local_data(
        data, np.ones((8 // nproc,), np.float32))
    total = jax.jit(lambda x: x.sum(), out_shardings=repl)(probe)
    assert float(jax.device_get(total)) == 8.0
    barrier("post-clique")
    # Initialize INSIDE jit with replicated out_shardings: works identically
    # single- and multi-process (no host->non-addressable-device transfer).
    state = jax.jit(
        lambda: create_train_state(model, jax.random.PRNGKey(0), tx),
        out_shardings=repl)()
    step_fn = make_train_step(model, tx, cfg, mesh)

    # per-process contiguous shard of each global batch (loader contract)
    per = GLOBAL_BATCH // nproc
    lo, hi = pid * per, (pid + 1) * per

    def to_global(arr):
        return jax.make_array_from_process_local_data(data, arr[lo:hi])

    for s in range(STEPS):
        b = _global_batch(ds, s)
        state, metrics = step_fn(state, to_global(b.images),
                                 to_global(b.boxes), to_global(b.labels),
                                 to_global(b.valid))
        m = {k: float(v) for k, v in jax.device_get(metrics).items()}
        print(f"proc {pid}: step {s} {m}", flush=True)
        loss = m["loss"]
        assert np.isfinite(loss), m

    # summarize final params (replicated -> addressable on every process)
    flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
    names, sums, absums, heads = [], [], [], []
    for path, leaf in flat:
        a = np.asarray(jax.device_get(leaf), np.float64)
        names.append(jax.tree_util.keystr(path))
        sums.append(a.sum())
        absums.append(np.abs(a).sum())
        head = a.reshape(-1)[:8].astype(np.float64)
        heads.append(np.pad(head, (0, 8 - head.size)))
    np.savez(out_path, names=np.array(names), sums=np.array(sums),
             absums=np.array(absums), heads=np.stack(heads),
             loss=loss)
    print(f"proc {pid}: wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
